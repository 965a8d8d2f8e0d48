"""Regenerate the two former df-drift plain-GMRES cells on-chip.

The fused ef64 kernel (ops/pallas_gmres.py, pinned draw matvec=diff + CGS2)
was validated in interpret mode to land the PETSc-exact counts at the
knife-edge cells (2D N=8 -> 40, 3D nx=4 -> 27; docs/design.md §7). This
script re-measures exactly those cells on the attached TPU and splices them
into the committed profiling CSVs — iff the counts are exact.

Usage: python experiments/regen_ef64_cells.py [--splice]
"""

import argparse
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--splice", action="store_true",
                    help="splice exact rows into the committed CSVs")
    args = ap.parse_args()

    from perphil_tpu.experiments.iterative_bench import Approach
    from perphil_tpu.experiments.profiling import run_perf_once, splice_perf_csv
    from perphil_tpu.experiments.profiling_3d import run_perf_once_3d

    out2 = ROOT / "notebooks/results-conforming-2d/petsc_profiling/petsc_perf_breakdown.csv"
    out3 = ROOT / "notebooks/results-conforming-3d/petsc_profiling/petsc_perf_breakdown_3d.csv"

    ok = True

    res2 = run_perf_once(8, 8, Approach.PLAIN_GMRES, repeats=5, backend="events")
    print(f"[2D N=8 GMRES] its={res2.iterations} (want 40) "
          f"time_total={res2.time_total:.4g}s res={res2.residual:.3e}")
    if res2.iterations == 40:
        if args.splice:
            splice_perf_csv([res2.to_dict()], out2)
            print("  spliced into", out2.name)
    else:
        ok = False

    res3 = run_perf_once_3d(4, Approach.PLAIN_GMRES, repeats=3, backend="events",
                            ordering_parity=True)
    print(f"[3D nx=4 GMRES] its={res3.iterations} (want 27) "
          f"time_total={res3.time_total:.4g}s res={res3.residual:.3e}")
    if res3.iterations == 27:
        if args.splice:
            splice_perf_csv([res3.to_dict()], out3)
            print("  spliced into", out3.name)
    else:
        ok = False

    print("OK" if ok else "MISMATCH — nothing spliced for the off cells")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
