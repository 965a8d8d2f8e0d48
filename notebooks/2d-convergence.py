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

fig, axs = plt.subplots(1, 2, figsize=(11, 4.5))
for err, ax in zip(("e1_L2", "e1_H1s"), axs):
    for ap in APPROACHES:
        sel = df[df.solver == ap.value].sort_values("h")
        ax.loglog(sel.h, sel[err], "o-", label=ap.value)
    ax.set_xlabel("h")
    ax.set_ylabel(err)
    ax.grid(True, which="both", alpha=0.3)
axs[0].legend(fontsize=7)
fig.tight_layout()
fig.savefig(OUT / "convergence.png", dpi=150)
print("wrote", OUT / "convergence.png")
