"""Triple-float (three-f32, ~71-bit) vector algebra: accuracy invariants.

``ops/tf32`` is the knife-edge Krylov mode (docs/design.md §7): on tiny
unpreconditioned systems the 49-bit df32 trajectory drifts +1 against
PETSc's f64 counts (2D N=8: 41 vs 40, 3D nx=4: 28 vs 27), so those cells
run triple-float vectors whose rounding sits BELOW f64's — the tf result
converted to f64 must match a pure-f64 computation to within f64's own
rounding. The knife-edge iteration counts themselves are pinned in
``test_parity_regression.py``.

Reference role: PETSc's f64 KSP vector arithmetic
(/root/reference/src/perphil/solvers/parameters.py:12-27).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from perphil_tpu.ops.tf32 import (
    split64_3,
    tf_add,
    tf_apply_stencil,
    tf_basis_comb,
    tf_basis_dot,
    tf_dot,
    tf_from_f64,
    tf_mul,
    tf_norm,
    tf_scale64,
    tf_sub,
    tf_sum_tree,
    tf_to_f64,
)


def _rnd(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape)


def test_split64_3_roundtrip_exact():
    """hi+mid+lo == the f64 input EXACTLY (72 mantissa bits cover 53) —
    within f32's exponent range: the lo word sits ~48 bits below hi, so
    exactness holds for |x| in ~[1e-24, 1e38] (the solver's dynamic range;
    far outside it the tail underflows f32 subnormals)."""
    x = _rnd(4096, 0) * np.logspace(-15, 15, 4096)
    hi, mid, lo = split64_3(jnp.asarray(x))
    back = (
        np.asarray(hi, np.float64)
        + np.asarray(mid, np.float64)
        + np.asarray(lo, np.float64)
    )
    assert np.array_equal(back, x)
    # canonical ordering: the mid word sits below hi's f32 ulp
    nz = np.abs(x) > 0
    assert np.all(
        np.abs(np.asarray(mid))[nz] <= np.spacing(np.abs(np.asarray(hi)))[nz]
    )


def test_tf_add_sub_below_f64_rounding():
    a = _rnd(3000, 1)
    b = _rnd(3000, 2) * 1e-8  # exercise wide-exponent cancellation
    ta, tb = tf_from_f64(jnp.asarray(a)), tf_from_f64(jnp.asarray(b))
    s = np.asarray(tf_to_f64(tf_add(ta, tb)))
    d = np.asarray(tf_to_f64(tf_sub(ta, tb)))
    np.testing.assert_allclose(s, a + b, rtol=1e-15, atol=0)
    np.testing.assert_allclose(d, a - b, rtol=1e-15, atol=0)


def test_tf_mul_scale_below_f64_rounding():
    a = _rnd(2000, 3)
    b = _rnd(2000, 4)
    ta, tb = tf_from_f64(jnp.asarray(a)), tf_from_f64(jnp.asarray(b))
    p = np.asarray(tf_to_f64(tf_mul(ta, tb)))
    np.testing.assert_allclose(p, a * b, rtol=1e-15, atol=1e-300)
    c = 0.7853981633974483  # non-dyadic f64 scalar
    sc = np.asarray(tf_to_f64(tf_scale64(ta, c)))
    np.testing.assert_allclose(sc, a * c, rtol=1e-15, atol=0)


def test_tf_dot_matches_f64_to_its_own_rounding():
    """tf_dot carries ~2^-70 relative error — returned f64 must match an
    exactly-computed dot to f64 rounding, BEATING a plain f64 loop."""
    u = _rnd(5000, 5)
    v = _rnd(5000, 6)
    got = float(tf_dot(tf_from_f64(jnp.asarray(u)), tf_from_f64(jnp.asarray(v))))
    want = float(np.dot(u.astype(np.longdouble), v.astype(np.longdouble)))
    assert abs(got - want) <= 4 * np.finfo(np.float64).eps * float(
        np.abs(u) @ np.abs(v)
    )
    n = float(tf_norm(tf_from_f64(jnp.asarray(u))))
    assert abs(n - np.linalg.norm(u)) <= 1e-15 * np.linalg.norm(u)


def test_tf_sum_tree_ill_conditioned():
    x = _rnd(10_001, 7) * np.logspace(-8, 8, 10_001)
    s = tf_sum_tree(tf_from_f64(jnp.asarray(x)))
    got = float(tf_to_f64(s))
    want = float(np.sum(np.sort(x.astype(np.longdouble))))
    assert abs(got - want) <= 1e-14 * float(np.sum(np.abs(x)))


def test_tf_basis_ops_match_f64():
    V = _rnd((7, 300), 8)
    w = _rnd(300, 9)
    Vt = tf_from_f64(jnp.asarray(V))
    wt = tf_from_f64(jnp.asarray(w))
    h = np.asarray(tf_basis_dot(Vt, wt))
    np.testing.assert_allclose(h, V @ w, rtol=1e-14, atol=1e-14)
    comb = tf_basis_comb(jnp.asarray(V @ w), Vt)
    got = np.asarray(tf_to_f64(comb))
    np.testing.assert_allclose(got, (V @ w) @ V, rtol=1e-14, atol=1e-14)


@pytest.mark.parametrize("dim", [2, 3])
def test_tf_apply_stencil_matches_f64(dim):
    """Both the dyadic fast path (library stencils are dyadic-factorable)
    and the general path must reproduce an f64 stencil apply to f64
    rounding."""
    from perphil_tpu.ops.stencil import apply_stencil

    shape = (12, 9) if dim == 2 else (6, 7, 5)
    x = _rnd(shape, 10 + dim)
    # a real library stencil: 2D/3D Laplacian K from the assembled operator
    if dim == 2:
        st = np.array([[-1 / 3, -1 / 3, -1 / 3], [-1 / 3, 8 / 3, -1 / 3], [-1 / 3, -1 / 3, -1 / 3]])
    else:
        st = np.zeros((3, 3, 3))
        st[1, 1, 1] = 8.0 / 3.0
        st[0, 1, 1] = st[2, 1, 1] = st[1, 0, 1] = st[1, 2, 1] = st[1, 1, 0] = st[1, 1, 2] = -1.0 / 3.0
        st[0, 0, 1] = st[0, 2, 1] = st[2, 0, 1] = st[2, 2, 1] = -1.0 / 12.0
    want = np.asarray(
        apply_stencil(jnp.asarray(x, jnp.float64), jnp.asarray(st, jnp.float64))
    )
    got = np.asarray(tf_to_f64(tf_apply_stencil(tf_from_f64(jnp.asarray(x)), st)))
    np.testing.assert_allclose(got, want, rtol=5e-15, atol=1e-17)
