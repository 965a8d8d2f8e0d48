"""Per-stage marginal breakdown of the on-device band parity-ILU apply.

Times each component of ``BandParityILU.apply_nat_df`` (and the outer
GMRES iteration's other costs) with the shared chained-marginal protocol,
so the optimization targets are measured, not guessed:

- ``gather_half``      one permutation gather of a field (natural->perm)
- ``trisolve_one``     one packed dense-band trisolve (PL1)
- ``coupling_f32``     one f32 varying-stencil inter-field coupling
- ``apply_f32``        the full f32 apply (4 trisolves + 2 couplings + 6
                       half-gathers)
- ``defect_df``        the df defect evaluation (6 df varying stencils)
- ``apply_corrected``  the production df-corrected apply (2x apply_f32 +
                       defect)
- ``outer_matvec_df``  the df stencil operator matvec

Usage: python experiments/band_ilu_stages.py [nx] [--csv PATH]
"""

import argparse
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("nx", nargs="?", type=int, default=32)
    ap.add_argument("--csv", default=None)
    args = ap.parse_args()
    nx = args.nx

    import jax
    import jax.numpy as jnp
    import numpy as np

    from perphil_tpu.forms.spaces import create_function_spaces, mixed_space
    from perphil_tpu.mesh.structured import create_cube_mesh
    from perphil_tpu.models.dpp.parameters import DPPParameters
    from perphil_tpu.ops import ordering as od
    from perphil_tpu.ops.bandsolve import (
        apply_varying_stencil,
        build_band_parity_ilu,
        tri_apply,
    )
    from perphil_tpu.ops.ilu import build_monolithic_system
    from perphil_tpu.utils.marginal import chained_marginal, fn_chain_maker

    mesh = create_cube_mesh(nx, nx, nx, hexahedral=False)
    params = DPPParameters()
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    from perphil_tpu.ops.assembly import DPPOperator

    op = DPPOperator(W, params)
    sysm = build_monolithic_system(mesh, params)
    A = od.to_csr(sysm)
    nv = mesh.num_vertices
    A = od.tighten_pattern(A, sysm, mesh, params)
    perm = od.blocked(od.cell_rcm_parity(mesh))
    Ap = A[perm][:, perm].tocsr()
    Ap.sort_indices()
    F, _ = od.native_ilu0(Ap)
    band = build_band_parity_ilu(
        Ap, perm, nv, op.grid_shape, F, with_correction=True
    )
    L11, L21, L22, U11, U12, U22 = band.nat_factors

    shape = op.grid_shape
    rng = np.random.default_rng(0)
    r1 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    r2 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    tail = band.PL1.shape[0] * band.B - nv
    rp = jnp.pad(r1.ravel()[band.vperm], (0, tail))
    rstk = jnp.stack([r1, r2])
    zstk = jnp.zeros_like(rstk)
    mv_df = op.stacked_matvec_df()

    from perphil_tpu.ops.df32 import df_add, df_sub
    from perphil_tpu.ops.bandsolve import df_apply_varying_stencil

    def gather_half(u):
        return (u.ravel()[band.vperm] * 1.0000001).reshape(shape)

    def trisolve_one(r):
        return tri_apply(band.PL1, r, lower=True, pad=band.pad) * 1.0000001

    def coupling_f32(u):
        return apply_varying_stencil(u, band.vals21) * 0.001 + u * 0.5

    def apply_f32(a, b):
        z1, z2 = band.apply_nat(a, b)
        return z1 * 0.001 + a * 0.5, z2 * 0.001 + b * 0.5

    def defect_df(zh, zl):
        z1d, z2d = (zh[0], zl[0]), (zh[1], zl[1])
        w1 = df_add(
            df_apply_varying_stencil(z1d, U11),
            df_apply_varying_stencil(z2d, U12),
        )
        w2 = df_apply_varying_stencil(z2d, U22)
        Mz1 = df_add(w1, df_apply_varying_stencil(w1, L11))
        Mz2 = df_add(
            w2,
            df_add(
                df_apply_varying_stencil(w1, L21),
                df_apply_varying_stencil(w2, L22),
            ),
        )
        d1 = df_sub(z1d, Mz1)
        d2 = df_sub(z2d, Mz2)
        return (
            jnp.stack([d1[0], d2[0]]) * 0.001 + zh * 0.5,
            jnp.stack([d1[1], d2[1]]) * 0.001 + zl * 0.5,
        )

    def apply_corrected(rh, rl):
        zh, zl = band.apply_nat_df((rh, rl))
        return zh * 0.001 + rh * 0.5, zl * 0.001 + rl * 0.5

    def outer_matvec(xh, xl):
        yh, yl = mv_df((xh, xl))
        return yh * 0.001 + xh * 0.5, yl * 0.001 + xl * 0.5

    stages = [
        ("gather_half", gather_half, (r1,)),
        ("trisolve_one", trisolve_one, (rp,)),
        ("coupling_f32", coupling_f32, (r1,)),
        ("apply_f32", apply_f32, (r1, r2)),
        ("defect_df", defect_df, (rstk, zstk)),
        ("apply_corrected", apply_corrected, (rstk, zstk)),
        ("outer_matvec_df", outer_matvec, (rstk, zstk)),
    ]
    # the stage fns close over the packed block arrays (GBs at nx=40):
    # plain jit would inline them into the HLO constant pool and trip the
    # relay's payload limit (HTTP 413) — lift them to runtime args exactly
    # like the production solver does
    from perphil_tpu.solvers.solver import _lifted_jit
    from perphil_tpu.utils.marginal import keepalive_feedback

    def lifted_chain_maker(fn, example):
        def make(length):
            def chain(*a):
                def body(carry, _):
                    out = fn(*carry)
                    return keepalive_feedback(out, carry), None

                final, _ = jax.lax.scan(body, a, None, length=length)
                return jnp.sum(jax.tree_util.tree_leaves(final)[0])

            return _lifted_jit(chain, *example)

        return make

    rows = []
    for name, fn, a in stages:
        t = chained_marginal(lifted_chain_maker(fn, a), a, 10)
        rows.append({"nx": nx, "stage": name, "seconds": t})
        print(f"{name:18s} {t*1e3:9.4f} ms", flush=True)

    if args.csv:
        import csv

        with open(args.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["nx", "stage", "seconds"])
            w.writeheader()
            w.writerows(rows)
        print("wrote", args.csv)


if __name__ == "__main__":
    main()
