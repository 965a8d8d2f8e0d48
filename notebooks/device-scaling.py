# %% [markdown]
# # Device-mesh scaling (strong & weak) — harness + artifacts
#
# The reference's analog is MPI domain decomposition, which its CI never
# exercises (SURVEY §2.2). Here the DPP solve is sharded over a
# `jax.sharding.Mesh` (`parallel/sharding.py`) and swept over device counts
# by `experiments/scaling.py`, producing
# `results-conforming-{2d,3d}/scaling/scaling*.csv`.
#
# IMPORTANT: the committed CSVs were produced on a VIRTUAL device mesh
# (`--xla_force_host_platform_device_count`, `platform=cpu` column) — all k
# "devices" share one host core, so wall-clock speedup/efficiency would be
# physically meaningless and those columns are left EMPTY on virtual rows.
# What IS valid on a virtual mesh (GSPMD partitions the same program as on
# a pod slice): `halo_bytes_per_exchange` (per-device boundary-plane
# traffic), `matvec_collectives` (collective ops counted from the compiled
# sharded matvec HLO), and `iteration_parity` vs the single-device solve.
# On a real pod slice, run
# `python -m perphil_tpu.experiments.scaling --platform default` to
# populate speedup/efficiency with chip measurements.

# %%
import os
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd

HERE = Path(__file__).parent

# %%
for dim, rel in [("2d", "results-conforming-2d/scaling/scaling.csv"),
                 ("3d", "results-conforming-3d/scaling/scaling_3d.csv")]:
    p = HERE / rel
    if not p.exists():
        continue
    df = pd.read_csv(p)
    platform = df.platform.iloc[0] if "platform" in df else "unknown"
    fig, axs = plt.subplots(1, 2, figsize=(11, 4.2))
    for mode, ax in zip(("strong", "weak"), axs):
        sel = df[df["mode"] == mode]
        for ap, sub in sel.groupby("approach"):
            sub = sub.sort_values("devices")
            ax.plot(sub.devices, sub.time_s, "o-", label=ap)
        ax.set_xscale("log", base=2)
        ax.set_yscale("log")
        ax.set_xlabel("devices")
        ax.set_ylabel("time per solve [s]")
        ax.set_title(f"{mode} scaling ({dim}, platform={platform})")
        ax.grid(True, which="both", alpha=0.3)
        ax.legend(fontsize=7)
    fig.tight_layout()
    out = p.parent / f"scaling_{dim}.png"
    fig.savefig(out, dpi=150)
    plt.close(fig)
    print("wrote", out)
    # sharded-correctness check: iteration counts must be device-count
    # invariant (the same Krylov trajectory up to reduction roundoff)
    for (mode, ap, N), sub in df.groupby(["mode", "approach", "N"]):
        assert sub.iterations.nunique() <= 2, (
            f"{dim} {mode} {ap} N={N}: iteration counts vary with device "
            f"count: {sorted(sub.iterations.unique())}"
        )
    print(f"{dim}: iteration counts device-count-invariant across "
          f"{df.devices.nunique()} mesh sizes")
