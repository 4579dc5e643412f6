"""TPU-native FEM layer: meshes, P1 spaces, differentiable Galerkin assembly.

This package replaces the dolfin/PETSc layer-0/1 of the reference stack
(SURVEY.md section 1): meshes and spaces are static numpy metadata, fields are
jnp arrays, and assembly is a pure jax function differentiable in all inputs.
"""

from .mesh import Mesh2D, rectangle_mesh, unit_square_mesh, boundary_edges
from .space import FunctionSpace
from .quadrature import triangle_rule
from .assembly import (
    GalerkinForm,
    BoundGalerkinForm,
    DirichletBC,
    mass_matrix,
    stiffness_matrix,
    boundary_mass_matrix,
    mask_residual,
    bc_symmetrize,
    band_bc_masks,
    bc_symmetrize_banded,
    bc_symmetrize_banded_from_mask,
    bc_symmetrize_banded_masked,
    bc_zero_rows,
    bc_apply_rhs,
)
from .observation import (
    assemble_pointwise_observation,
    locate_points,
    grid_targets,
    vector_to_function,
)
from .multigrid import (
    restrict_injection,
    prolong_linear,
    coarse_newton_warm_start,
)
