"""Import-path parity with the reference's ``perphil.mesh.builtin``
(``/root/reference/src/perphil/mesh/builtin.py``): user code written as
``from perphil.mesh.builtin import create_mesh`` ports by renaming only the
package."""

from perphil_tpu.mesh.structured import create_cube_mesh, create_mesh

__all__ = ["create_mesh", "create_cube_mesh"]
