"""Re-measure the 3D ordering-parity GMRES+ILU rows ON DEVICE.

The dense-band block trisolve (``ops/bandsolve.py``) moves the parity-mode
GMRES+ILU solve onto the chip (previously ``measurement_class=host-cpu``
via the C++ CSR kernels). This runner re-measures exactly those rows
through the standard profiling harness (chained-marginal timing) and
splices them into the committed CSV — iff the iteration counts are exact.

Usage: python experiments/regen_band_ilu_rows.py [--splice] [nx ...]
"""

import argparse
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

REF = {4: 6, 8: 8, 12: 12, 16: 15, 20: 17, 24: 20, 32: 26, 36: 29, 40: 33}

# Hardware-validated per-size apply-precision policy (2026-08-21, v5e):
# the df defect-correction pass is needed only at the knife-edge sizes —
# without it the count drifts -1 at nx=16 (on-device) and +1 at nx=40
# (CPU probe + design.md §7); at 4..12 and 20..36 the pure-f32 dense-block
# apply lands the published counts exactly and runs ~2x faster. The
# production default (solvers/solver.py) stays correction-ON for safety;
# this runner pins the validated mode per size so the committed rows are
# reproducible.
NEEDS_DF = {16, 40}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--splice", action="store_true")
    ap.add_argument("sizes", nargs="*", type=int, default=None)
    args = ap.parse_args()
    sizes = args.sizes or sorted(REF)

    from perphil_tpu.experiments.iterative_bench import Approach
    from perphil_tpu.experiments.profiling import splice_perf_csv
    from perphil_tpu.experiments.profiling_3d import run_perf_once_3d

    out = (
        ROOT / "notebooks/results-conforming-3d/petsc_profiling/"
        "petsc_perf_breakdown_3d.csv"
    )
    import os

    # force the band DEVICE engine at every size (this runner IS the
    # device measurement tool; the sweep's own per-size policy would route
    # nx<=16/40 to the host engine), with the validated df mode per size
    os.environ["PERPHIL_TPU_BAND_ILU"] = "1"
    ok = True
    for nx in sizes:
        os.environ["PERPHIL_TPU_BAND_ILU_DF"] = (
            "1" if nx in NEEDS_DF else "0"
        )
        res = run_perf_once_3d(
            nx, Approach.GMRES_ILU, repeats=3, backend="events",
            ordering_parity=True,
        )
        row = res.to_dict()
        exact = res.iterations == REF[nx]
        print(
            f"[3D nx={nx} GMRES+ILU parity] its={res.iterations} "
            f"(want {REF[nx]}) time_total={res.time_total:.4g}s "
            f"class={row.get('measurement_class')}",
            flush=True,
        )
        if exact and args.splice:
            splice_perf_csv([row], out)
            print("  spliced", flush=True)
        ok = ok and exact
    print("OK" if ok else "MISMATCH — off cells not spliced")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
