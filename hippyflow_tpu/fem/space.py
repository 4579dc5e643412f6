"""P1 Lagrange function spaces on triangle meshes.

Replaces ``dl.FunctionSpace(mesh, 'Lagrange', 1)`` used throughout the
reference (e.g. `applications/confusion/confusion_linear_observable.py:114`).
Degrees of freedom are vertex values; fields are flat jnp arrays of length
``space.dim`` so that they compose directly with jax transformations.

The per-cell geometric factors (physical basis gradients, cell volumes,
quadrature positions) are precomputed once in numpy and captured as constants
by the jitted assembly kernels: static shapes, zero host<->device traffic per
solve.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import numpy as np

from .mesh import Mesh2D
from .quadrature import triangle_rule

# Reference P1 basis on the unit triangle.
_REF_GRADS = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])  # (3, 2)


def _ref_values(points: np.ndarray) -> np.ndarray:
    """P1 shape functions at reference points (nq, 2) -> (nq, 3)."""
    lam0 = 1.0 - points[:, 0] - points[:, 1]
    return np.stack([lam0, points[:, 0], points[:, 1]], axis=1)


@dataclass(frozen=True)
class Geometry:
    """Per-cell geometric factors (all numpy, static)."""

    grads: np.ndarray  # (nc, 3, 2) physical gradients of P1 basis
    volumes: np.ndarray  # (nc,) triangle areas
    detJ: np.ndarray  # (nc,) |det of affine map| = 2 * area


@dataclass(frozen=True, eq=False)
class FunctionSpace:
    """Scalar P1 Lagrange space. ``dim == mesh.num_vertices``."""

    mesh: Mesh2D

    @property
    def dim(self) -> int:
        return self.mesh.num_vertices

    @property
    def dof_coords(self) -> np.ndarray:
        return self.mesh.vertices

    @cached_property
    def geometry(self) -> Geometry:
        x = self.mesh.vertices[self.mesh.cells]  # (nc, 3, 2)
        # Affine map F(xi) = x0 + J xi, J columns = edge vectors.
        J = np.stack([x[:, 1] - x[:, 0], x[:, 2] - x[:, 0]], axis=2)  # (nc,2,2)
        detJ = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
        invJ = (
            np.stack(
                [
                    np.stack([J[:, 1, 1], -J[:, 0, 1]], axis=1),
                    np.stack([-J[:, 1, 0], J[:, 0, 0]], axis=1),
                ],
                axis=1,
            )
            / detJ[:, None, None]
        )
        # physical grad phi_i = invJ^T @ ref_grad_i
        grads = np.einsum("cdk,id->cik", invJ, _REF_GRADS)
        return Geometry(grads=grads, volumes=np.abs(detJ) / 2.0, detJ=np.abs(detJ))

    def quad_points(self, degree: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Return (phi (nq,3), xq (nc,nq,2), wdet (nc,nq)) for a rule."""
        pts, w = triangle_rule(degree)
        phi = _ref_values(pts)  # (nq, 3)
        x = self.mesh.vertices[self.mesh.cells]  # (nc, 3, 2)
        xq = np.einsum("qi,cid->cqd", phi, x)
        wdet = 2.0 * w[None, :] * self.geometry.volumes[:, None]
        return phi, xq, wdet

    def boundary_dofs(self, predicate=None) -> np.ndarray:
        """Boolean mask of boundary dofs, optionally filtered by a predicate
        ``predicate(x) -> bool`` over coordinates (vectorized over (n,2))."""
        mask = self.mesh.boundary_mask.copy()
        if predicate is not None:
            mask &= np.asarray(predicate(self.mesh.vertices), dtype=bool)
        return mask

    def interpolate(self, fn) -> np.ndarray:
        """Vertex interpolation of ``fn((n,2) coords) -> (n,)``."""
        return np.asarray(fn(self.mesh.vertices), dtype=np.float64)
