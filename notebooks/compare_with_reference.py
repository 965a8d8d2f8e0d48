# %% [markdown]
# # Reference comparison report
#
# Loads the CSV artifacts this library regenerates under
# `notebooks/results-conforming-{2d,3d}/` and the reference's committed CSVs
# (read-only at /root/reference), and emits `docs/benchmarks.md` — iteration
# counts, errors, condition numbers, and wall-clock side by side.

# %%
from pathlib import Path

import pandas as pd

HERE = Path(__file__).parent
REF = Path("/root/reference/notebooks")
OUT = HERE.parent / "docs" / "benchmarks.md"

lines = [
    "# Benchmark & parity report",
    "",
    "Ours = TPU v5e single chip (this library); Ref = the reference's",
    "committed CSVs (single-node CPU, PETSc 3.23.4 + MUMPS). Regenerate with",
    "`python tasks.py notebooks` then `python notebooks/compare_with_reference.py`.",
    "",
]


def _sec(title):
    lines.extend(["", f"## {title}", ""])


def _table(header, rows):
    lines.append("| " + " | ".join(header) + " |")
    lines.append("|" + "---|" * len(header))
    for r in rows:
        lines.append("| " + " | ".join(str(x) for x in r) + " |")


# %% 2D convergence: iterations and errors
ours = pd.read_csv(HERE / "results-conforming-2d" / "convergence.csv")
ref = pd.read_csv(REF / "results-conforming-2d" / "convergence.csv")
_sec("2D convergence (manufactured solution, Q1 quads)")
rows = []
for N in sorted(ours.N.unique()):
    for sol in ours[ours.N == N].solver.unique():
        o = ours[(ours.N == N) & (ours.solver == sol)]
        r = ref[(ref.N == N) & (ref.solver == sol)]
        if len(o) == 0 or len(r) == 0:
            continue
        o, r = o.iloc[0], r.iloc[0]
        rows.append([
            N, sol, int(o.it), int(r.it),
            f"{o.e1_L2:.6g}", f"{r.e1_L2:.6g}",
            f"{abs(o.e1_L2 - r.e1_L2) / r.e1_L2:.1e}",
        ])
_table(["N", "solver", "its (ours)", "its (ref)", "e1_L2 (ours)", "e1_L2 (ref)", "rel diff"], rows)

eoc_o = pd.read_csv(HERE / "results-conforming-2d" / "convergence_eoc.csv")
eoc_r = pd.read_csv(REF / "results-conforming-2d" / "convergence_eoc.csv")
_sec("2D observed convergence orders (EOC)")
_table(
    ["err", "slope (ours, mean)", "slope (ref, mean)"],
    [[e, f"{eoc_o[eoc_o.err == e].slope.mean():.4f}", f"{eoc_r[eoc_r.err == e].slope.mean():.4f}"]
     for e in ("e1_L2", "e2_L2", "e1_H1s", "e2_H1s")],
)

# %% conditioning
co = pd.read_csv(HERE / "results-conforming-2d" / "conditioning" / "conditioning.csv")
cr = pd.read_csv(REF / "results-conforming-2d" / "conditioning" / "conditioning.csv")
_sec("2D condition numbers")
rows = []
for N in sorted(co.N.unique()):
    o = co[co.N == N].iloc[0]
    rr = cr[cr.N == N]
    if len(rr) == 0:
        continue
    r = rr.iloc[0]
    rows.append([N, f"{o.cond_monolithic:.4f}", f"{r.cond_monolithic:.4f}",
                 f"{o.cond_macro:.4f}", f"{r.cond_macro:.4f}",
                 f"{o.cond_micro:.4f}", f"{r.cond_micro:.4f}"])
_table(["N", "kappa(A) ours", "ref", "kappa(A00) ours", "ref", "kappa(A11) ours", "ref"], rows)

c3o = pd.read_csv(HERE / "results-conforming-3d" / "conditioning" / "conditioning_3d.csv")
c3r = pd.read_csv(REF / "results-conforming-3d" / "conditioning" / "conditioning_3d.csv")
_sec("3D (hex) condition numbers")
rows = []
for N in sorted(c3o.N.unique()):
    o = c3o[c3o.N == N].iloc[0]
    rr = c3r[c3r.N == N]
    if len(rr) == 0:
        continue
    r = rr.iloc[0]
    rows.append([N, f"{o.cond_monolithic:.2f}", f"{r.cond_monolithic:.2f}",
                 f"{o.cond_macro:.3f}", f"{r.cond_macro:.3f}",
                 f"{o.cond_micro:.2f}", f"{r.cond_micro:.2f}"])
_table(["N", "kappa(A) ours", "ref", "kappa(A00) ours", "ref", "kappa(A11) ours", "ref"], rows)

# %% profiling wall-clock
def _prof_table(our_csv, ref_csv, sizes, title):
    if not our_csv.exists():
        return
    po = pd.read_csv(our_csv)
    pr = pd.read_csv(ref_csv)
    _sec(title)
    rows = []
    for nx in sizes:
        for ap in po.approach.unique():
            o = po[(po.nx == nx) & (po.approach == ap)]
            r = pr[(pr.nx == nx) & (pr.approach == ap)]
            if len(o) == 0 or len(r) == 0:
                continue
            o, r = o.iloc[0], r.iloc[0]
            speed = r.time_total / o.time_total if o.time_total > 0 else float("nan")
            rows.append([nx, ap, int(o.iterations), int(r.iterations),
                         f"{o.time_total:.4g}", f"{r.time_total:.4g}", f"{speed:.1f}x"])
    _table(["nx", "approach", "its (ours)", "its (ref)",
            "time ours [s]", "time ref [s]", "speedup"], rows)


_prof_table(
    HERE / "results-conforming-2d" / "petsc_profiling" / "petsc_perf_breakdown.csv",
    REF / "results-conforming-2d" / "petsc_profiling" / "petsc_perf_breakdown.csv",
    [64, 128, 256],
    "2D solver wall-clock (time_total per solve, TPU vs CPU)",
)
_prof_table(
    HERE / "results-conforming-3d" / "petsc_profiling" / "petsc_perf_breakdown_3d.csv",
    REF / "results-conforming-3d" / "petsc_profiling" / "petsc_perf_breakdown_3d.csv",
    [16, 32, 40],
    "3D solver wall-clock (tets, TPU vs CPU)",
)

# %% [markdown]
# The narrative sections are emitted by the generator too, so regenerating
# the report never clobbers them.

# %%
lines.append("""
## ILU modes in the 3D table

The main `petsc_perf_breakdown_3d.csv` GMRES+ILU rows (shown above) run in
ORDERING-PARITY mode (`pc_factor_mat_ordering_type=rcm`: pinned cell-RCM
DMPlex-numbering emulation + finite-element fill pattern) and match the
reference iteration column EXACTLY at every size (6/8/15/26/33 at
nx=4/8/16/32/40). The factorization/trisolves in an unstructured row order
are inherently sequential, so this path runs on the HOST through the native
C++ CSR kernels (`csrc/csr_solver.cpp`) — the same division of labor as
PETSc. After the factor-once / int32-index / fused-CGS kernel work it beats
the reference at every size on one host core (nx=40: 0.419 s vs 0.743 s).

The TPU-production ENVELOPE ILU — a strictly stronger preconditioner (the
structured factorization fills the whole 3^d offset envelope, hence fewer
iterations: 6/8/12/21/25) with device-speed applies — lives in the labeled
side CSV `petsc_perf_breakdown_3d_envelope_ilu.csv`.

## Small-N cells and the fused whole-solve kernels

The full regenerated CSVs (`notebooks/results-conforming-*/petsc_profiling/`)
include the small-N cells (2D nx<=32, 3D nx<=12), where per-solve work is
sub-millisecond. All six approaches dispatch to fused whole-solve Pallas
kernels there (`ops/pallas_gmres.py`, `ops/pallas_direct.py`): one kernel
per SOLVE, iteration counts validated against the XLA twins and the golden
PETSc numbers on hardware (plain GMRES 10/42/292/996 at 2D N=4/8/16/32 —
N=16 exactly matches PETSc's 292 where the XLA df path drifted to 294; ILU
5/7/11/20; fieldsplit 4 everywhere; 3D 28/190/465).

Two measurement facts shape these cells (see `docs/design.md` §5.1): the
device relay charges ~24 ms of fixed dispatch per execution, and a chained
`lax.scan` execution amortizes it (PETSc's event clocks never see a
dispatch layer at all, so amortizing it out is the honest analogue). The
timing harness sizes the chain from a measured per-trip MARGINAL — sizing
it from the dispatch-inflated single-solve time under-chained 10x and was
what kept the committed small-N rows at 0.35-0.95x through round 2. With
marginal-sized windows the fused kernels measure 1.1-33x the reference CPU
at every small-N cell except two:

- 3D nx=12 plain GMRES (~0.75x, 465 its) and 2D N=32 plain GMRES (~0.95x,
  996 its) are bound by the fused kernel's in-kernel CGS2 double
  orthogonalization (~50-150 us/iteration of basis sweeps). Single-pass
  CGS — PETSc's own default — measures 1.18x/1.25x on the same rows with
  identical iteration counts (996/465), but shifts the published 2D N=16
  count from PETSc's exact 292 to 293 (df32 single-CGS rounding vs
  PETSc's f64; N=8 sits at 42 vs the reference's 40 under either variant
  — the one documented fused-GMRES count drift). The committed rows keep
  CGS2 and the exact golden iteration columns: parity over the last 30%
  of wall-clock on those two cells (`PERPHIL_TPU_FUSED_CGS2=0` selects
  the faster variant).""")

# %%
OUT.parent.mkdir(exist_ok=True)
OUT.write_text("\n".join(lines) + "\n")
print(f"wrote {OUT}")
print("\n".join(lines[:40]))
