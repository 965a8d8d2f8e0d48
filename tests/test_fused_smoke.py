"""Default-suite interpret-mode smokes for the fused-kernel families.

The full interpret-mode validation of the whole-solve Pallas kernels lives
in ``test_pallas_gmres.py`` / ``test_pallas_direct.py`` and is slow-gated
(CI runs it with ``PERPHIL_RUN_SLOW=1``); a plain local ``pytest -q``
previously exercised none of the in-kernel paths (VERDICT r4 weak #6).
This module re-exports ONE fast representative per family — tiny
constant-closure cases, per the CLAUDE.md interpret-mode rules — so the
default suite compiles and runs at least one in-kernel path of each:

- fused GMRES family: the one-cycle residual self-consistency case
  (N=4, restart 5).
- fused direct family: the fast-diag fused solve vs the mixed-precision
  XLA path (2D N=4).
- grouped-layout family: already default-set (``test_grouped_geometry.py``
  interpret cases).

Importing the test functions detaches them from their origin module's
``pytestmark = pytest.mark.slow`` (marks attach per-module at collection),
which is exactly the intent.
"""

from test_pallas_direct import (  # noqa: F401
    test_fused_direct_matches_mixed_path as test_smoke_fused_direct,
)
from test_pallas_gmres import (  # noqa: F401
    test_one_cycle_estimate_matches_true_residual as test_smoke_fused_gmres_cycle,
)
