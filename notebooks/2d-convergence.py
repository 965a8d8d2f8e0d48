# %% [markdown]
# # 2D h-convergence study — conforming DPP (two pressures)
#
# TPU-native reproduction of the reference study
# (`/root/reference/notebooks/2d-convergence.py`): sweep N = 4..128 over the
# five solver approaches, compute L2/H1-seminorm errors against the
# manufactured solution, fit observed convergence orders (EOC), and write
# `results-conforming-2d/convergence.csv` + `convergence_eoc.csv` with the
# reference's schemas.
#
# Expected (reference `convergence_eoc.csv`): L2 EOC ~ 1.939 for p1 and p2,
# H1-seminorm EOC ~ 0.945, for every solver.

# %%
import os
from pathlib import Path

import numpy as np
import pandas as pd

from perphil_tpu.experiments.convergence_2d import SolverSpec, compute_eoc, run_one
from perphil_tpu.experiments.iterative_bench import Approach, params_for
from perphil_tpu.models.dpp import DPPParameters

OUT = Path(__file__).parent / "results-conforming-2d"
OUT.mkdir(parents=True, exist_ok=True)

NS = [4, 8, 16, 32, 64, 128]
if os.environ.get("PERPHIL_FAST"):
    NS = [4, 8, 16]

APPROACHES = [
    Approach.PLAIN_GMRES,
    Approach.GMRES_ILU,
    Approach.SS_GMRES,
    Approach.SS_GMRES_ILU,
    Approach.MONOLITHIC_MUMPS,
]

# %%
params = DPPParameters()
rows = []
for N in NS:
    for ap in APPROACHES:
        spec = SolverSpec(ap.value, params_for(ap))
        row = run_one(N=N, solver=spec, quad=True, degree=1, params=params)
        rows.append(row)
        print(f"N={N:>4} {ap.value:<35} it={row['it']:>6} e1_L2={row['e1_L2']:.6g}")

df = pd.DataFrame(rows)
df.to_csv(OUT / "convergence.csv", index=False)
print("wrote", OUT / "convergence.csv")

# %%
eoc = pd.DataFrame(compute_eoc(rows))
eoc.to_csv(OUT / "convergence_eoc.csv", index=False)
print(eoc.to_string(index=False))

# %% [markdown]
# ## Error-vs-h plot with slope triangles

# %%
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

def slope_triangle(ax, x0, y0, slope, width=2.0, label=None):
    """Annotate a log-log axis with a slope reference triangle (the
    reference notebook's EOC visual, `2d-convergence.py:225-274`)."""
    x1 = x0 * width
    y1 = y0 * (x1 / x0) ** slope
    ax.plot([x0, x1, x1, x0], [y0, y0, y1, y0], "k-", lw=0.8)
    ax.annotate(f"1", ((x0 * x1) ** 0.5, y0 * 0.82), ha="center", fontsize=7)
    ax.annotate(
        label or f"{slope:g}",
        (x1 * 1.06, (y0 * y1) ** 0.5),
        va="center",
        fontsize=7,
    )


fig, axs = plt.subplots(1, 2, figsize=(11, 4.5))
for (err, slope), ax in zip((("e1_L2", 2.0), ("e1_H1s", 1.0)), axs):
    for ap in APPROACHES:
        sel = df[df.solver == ap.value].sort_values("h")
        ax.loglog(sel.h, sel[err], "o-", label=ap.value)
    sel = df[df.solver == APPROACHES[0].value].sort_values("h")
    h_mid = float(sel.h.iloc[len(sel) // 2])
    e_mid = float(sel[sel.h == h_mid][err].iloc[0])
    slope_triangle(ax, h_mid, e_mid * 0.4, slope)
    ax.set_xlabel("h")
    ax.set_ylabel(err)
    ax.set_title(f"expected order {slope:g}")
    ax.grid(True, which="both", alpha=0.3)
axs[0].legend(fontsize=7)
fig.tight_layout()
fig.savefig(OUT / "convergence.png", dpi=150)
print("wrote", OUT / "convergence.png")

# %% [markdown]
# ## Per-solver EOC table vs the reference values

# %%
# every approach must deliver the same discretization accuracy: spread of
# EOC across solvers is a solver-correctness check, not a discretization one
piv = eoc.pivot_table(index="solver", columns="err", values="slope")
print(piv.to_string())
spread = float((piv.max() - piv.min()).max())
print("max EOC spread across solvers:", spread)
assert spread < 0.02, "a solver is polluting the discretization error"
