"""Function spaces and Functions on structured meshes.

Parity with ``/root/reference/src/perphil/forms/spaces.py:5-36`` (Firedrake
``FunctionSpace``/``VectorFunctionSpace`` factories) and the implicit Function
machinery the reference gets from Firedrake.

Continuous Lagrange spaces on the structured lattice: Q1/P1 (the only
degree any published perphil workload uses — ``pressure_deg=1`` defaults
throughout, e.g. reference ``forms/spaces.py:7``), arbitrary-degree Qp on
tensor-product meshes (``ops/tensorfem``), and P2 on simplex meshes
(``ops/simplexfem`` — P2 DoFs coincide with the once-refined lattice).
DoFs are stored as grid-shaped arrays over ``dof_mesh.node_shape``, which
keeps every operator application a stencil/convolution.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from perphil_tpu.config import default_dtype
from perphil_tpu.mesh.structured import StructuredMesh


@dataclass(frozen=True)
class FunctionSpace:
    """Scalar or vector CG space on a structured mesh.

    :param mesh: the structured mesh.
    :param family: "CG" (aliases "Lagrange", "Q", "P" accepted).
    :param degree: polynomial degree — any p on quad/hex meshes (Qp),
        1 or 2 on simplex meshes (P1/P2).
    :param value_shape: () for scalar, (dim,) for vector spaces.
    """

    mesh: StructuredMesh
    family: str = "CG"
    degree: int = 1
    value_shape: Tuple[int, ...] = ()

    def __post_init__(self):
        if self.family not in ("CG", "Lagrange", "Q", "P"):
            raise ValueError(f"Unsupported family {self.family!r}; only CG1-type spaces exist")
        if self.degree < 1:
            raise ValueError("degree must be >= 1")
        if self.degree > 2 and not self.mesh.is_tensor_product:
            raise ValueError(
                "Simplex meshes support degrees 1 and 2 (P2 DoFs are the "
                "once-refined lattice, ops/simplexfem); degree > 2 has no "
                "half-lattice structure. Tensor-product meshes support any "
                "degree (Qp via ops/tensorfem)."
            )

    @property
    def dof_mesh(self) -> StructuredMesh:
        """The lattice carrying this space's DoFs: the mesh itself for
        degree 1; the p-times-refined lattice for Qp (equispaced Lagrange
        nodes ARE a refined uniform grid, so grid-shaped storage, boundary
        masks and sharding carry over unchanged)."""
        if self.degree == 1:
            return self.mesh
        from dataclasses import replace

        return replace(
            self.mesh, cells=tuple(self.degree * c for c in self.mesh.cells)
        )

    def dim(self) -> int:
        """Total number of degrees of freedom."""
        return self.dof_mesh.num_vertices * int(np.prod(self.value_shape, dtype=int) or 1)

    def num_sub_spaces(self) -> int:
        """Scalar/vector spaces have no sub-spaces (parity helper)."""
        return 0

    @property
    def dof_shape(self) -> Tuple[int, ...]:
        return self.dof_mesh.node_shape + self.value_shape


@dataclass(frozen=True)
class IndexedFunctionSpace(FunctionSpace):
    """A sub-space handle from ``MixedFunctionSpace.sub(i)``; carries its
    field index so ``DirichletBC(W.sub(i), ...)`` knows which field it
    constrains (parity with Firedrake's indexed function spaces)."""

    index: int = 0


@dataclass(frozen=True)
class MixedFunctionSpace:
    """A product of scalar spaces, e.g. W = V x V for (p1, p2).

    Mirrors ``fd.MixedFunctionSpace`` usage at
    ``/root/reference/src/perphil/experiments/convergence_2d.py:88``.
    DoF numbering for materialized matrices is field-major (all p1, then all
    p2), matching Firedrake's per-field block layout.
    """

    spaces: Tuple[FunctionSpace, ...]

    def __post_init__(self):
        if len(self.spaces) < 1:
            raise ValueError("MixedFunctionSpace needs at least one sub-space")
        mesh = self.spaces[0].mesh
        if any(s.mesh != mesh for s in self.spaces):
            raise ValueError("All sub-spaces must share one mesh")

    @property
    def mesh(self) -> StructuredMesh:
        return self.spaces[0].mesh

    def num_sub_spaces(self) -> int:
        return len(self.spaces)

    def sub(self, i: int) -> "IndexedFunctionSpace":
        base = self.spaces[i]
        return IndexedFunctionSpace(
            mesh=base.mesh,
            family=base.family,
            degree=base.degree,
            value_shape=base.value_shape,
            index=i,
        )

    def dim(self) -> int:
        return sum(s.dim() for s in self.spaces)


def mixed_space(V: FunctionSpace, n: int = 2) -> MixedFunctionSpace:
    """Convenience: W = V x V (x ... n times)."""
    return MixedFunctionSpace(spaces=(V,) * n)


def create_function_spaces(
    mesh: StructuredMesh,
    velocity_deg: int = 1,
    pressure_deg: int = 1,
    velocity_family: str = "CG",
    pressure_family: str = "CG",
) -> Tuple[FunctionSpace, FunctionSpace]:
    """Build (velocity, pressure) spaces; parity with
    ``/root/reference/src/perphil/forms/spaces.py:5-36``."""
    U = FunctionSpace(
        mesh, family=velocity_family, degree=velocity_deg, value_shape=(mesh.dim,)
    )
    V = FunctionSpace(mesh, family=pressure_family, degree=pressure_deg)
    return U, V


Expr = Union[Callable[..., jnp.ndarray], float, int, jnp.ndarray, np.ndarray]


def _evaluate(expr: Expr, mesh: StructuredMesh, value_shape: Tuple[int, ...]) -> jnp.ndarray:
    """Evaluate an expression (callable of coordinates, constant, or array)
    at mesh vertices, returning a grid-shaped array."""
    dtype = default_dtype()
    target = mesh.node_shape + value_shape
    if callable(expr):
        coords = [jnp.asarray(c, dtype=dtype) for c in mesh.coordinates()]
        val = expr(*coords)
        if value_shape and isinstance(val, (tuple, list)):
            val = jnp.stack([jnp.broadcast_to(v, mesh.node_shape) for v in val], axis=-1)
        val = jnp.asarray(val, dtype=dtype)
        return jnp.broadcast_to(val, target)
    arr = jnp.asarray(expr, dtype=dtype)
    return jnp.broadcast_to(arr, target)


class Function:
    """A finite-element function: vertex DoF values with space metadata.

    Lightweight stand-in for ``fd.Function``; registered as a JAX pytree so
    Functions pass through ``jit``/``grad`` transparently.
    """

    def __init__(
        self,
        space: Union[FunctionSpace, MixedFunctionSpace],
        data=None,
        name: Optional[str] = None,
    ):
        self.space = space
        self.name = name
        dtype = default_dtype()
        if isinstance(space, MixedFunctionSpace):
            if data is None:
                data = tuple(jnp.zeros(s.dof_shape, dtype=dtype) for s in space.spaces)
            self.data = tuple(jnp.asarray(d, dtype=dtype) for d in data)
        else:
            if data is None:
                data = jnp.zeros(space.dof_shape, dtype=dtype)
            self.data = jnp.asarray(data, dtype=dtype)

    # -- structure -------------------------------------------------------

    def function_space(self):
        return self.space

    def sub(self, i: int) -> "Function":
        if not isinstance(self.space, MixedFunctionSpace):
            raise ValueError("sub() is only available on mixed-space Functions")
        return Function(self.space.sub(i), self.data[i])

    def split(self) -> Tuple["Function", ...]:
        if not isinstance(self.space, MixedFunctionSpace):
            raise ValueError("split() is only available on mixed-space Functions")
        return tuple(self.sub(i) for i in range(self.space.num_sub_spaces()))

    @property
    def dat(self) -> jnp.ndarray:
        """Flat DoF vector (field-major for mixed spaces), mirroring
        ``Function.dat.data`` access in the reference."""
        if isinstance(self.space, MixedFunctionSpace):
            return jnp.concatenate([jnp.ravel(d) for d in self.data])
        return jnp.ravel(self.data)

    # -- evaluation ------------------------------------------------------

    def interpolate(self, expr: Expr) -> "Function":
        """Set DoFs to the expression's nodal values (nodal interpolation;
        for Qp the nodes are the refined lattice, so this IS the degree-p
        Lagrange interpolant)."""
        if isinstance(self.space, MixedFunctionSpace):
            raise ValueError("Interpolate into sub-functions individually")
        self.data = _evaluate(expr, self.space.dof_mesh, self.space.value_shape)
        return self

    def assign(self, other: Union["Function", Expr]) -> "Function":
        if isinstance(other, Function):
            self.data = other.data
            return self
        return self.interpolate(other)

    def at(self, points) -> jnp.ndarray:
        """Evaluate at physical points via (bi/tri)linear interpolation.

        Parity with ``Function.at`` used by ``slice_along_x``
        (``/root/reference/src/perphil/utils/postprocessing.py:66-86``).
        """
        if isinstance(self.space, MixedFunctionSpace):
            raise ValueError("Evaluate sub-functions individually")
        # degree p evaluates multilinearly on the refined DoF lattice (exact
        # at nodes; O(h^2/p^2) between them — plotting/slicing accuracy)
        mesh = self.space.dof_mesh
        pts_arr = jnp.asarray(points, dtype=default_dtype())
        single = pts_arr.ndim == 1
        pts = jnp.atleast_2d(pts_arr)
        h = jnp.asarray(mesh.h)
        cells = np.asarray(mesh.cells)
        # cell index + local coordinate per dim (coordinate order)
        t = pts / h
        cell = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, cells - 1)
        loc = t - cell
        d = mesh.dim
        vals = 0.0
        for corner in np.ndindex(*((2,) * d)):
            w = 1.0
            idx = []
            for ax in range(d):
                c = corner[ax]
                w = w * jnp.where(c == 1, loc[:, ax], 1.0 - loc[:, ax])
                idx.append(cell[:, ax] + c)
            # grid arrays index slowest-first: reverse coordinate order
            vals = vals + w * self.data[tuple(reversed(idx))]
        return vals[0] if single else vals

    def copy(self) -> "Function":
        return Function(self.space, self.data, name=self.name)


def _function_flatten(f: Function):
    return (f.data,), (f.space, f.name)


def _function_unflatten(aux, children):
    space, name = aux
    f = Function.__new__(Function)
    f.space, f.name, f.data = space, name, children[0]
    return f


jax.tree_util.register_pytree_node(Function, _function_flatten, _function_unflatten)
