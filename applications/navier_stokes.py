"""Steady incompressible Navier-Stokes for the confusion velocity field.

Port of the reference's ``computeVelocityField``
(`applications/confusion/confusion_linear_observable.py:51-82`): steady NS at
Re = 100 on the unit square, driven up the left wall and down the right wall

    g = (0, (x<eps) - (x>1-eps))  on the whole boundary,

pressure pinned at the origin corner.

Discretization: equal-order P1 velocity/pressure (the reference uses
Taylor-Hood P2/P1) with Brezzi-Pitkaranta pressure stabilization
(+ delta h^2 grad p . grad q), solved by Newton with Reynolds continuation.
The weak form

    (2/Re) strain(v):strain(w) + (grad v . v) . w - p div w + div v q = 0

maps onto a 3-component VectorGalerkinForm (vx, vy, p).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hippyflow_tpu.fem import DirichletBC, FunctionSpace
from hippyflow_tpu.fem.vector_assembly import VectorGalerkinForm
from hippyflow_tpu.models import VariationalPDEProblem


def _ns_form(V: FunctionSpace, Re: float, stab_delta: float = 0.05) -> VectorGalerkinForm:
    h = V.mesh.cell_diameters()

    def flux(x, u, gu, m, z, c):
        gv = gu[:2]  # (2, 2) velocity gradient
        p = u[2]
        strain = 0.5 * (gv + gv.T)
        F_v = (2.0 / Re) * strain - p * jnp.eye(2, dtype=u.dtype)
        F_p = stab_delta * c["h"] ** 2 * gu[2]  # Brezzi-Pitkaranta
        return jnp.concatenate([F_v, F_p[None, :]], axis=0)

    def source(x, u, gu, m, z, c):
        v = u[:2]
        gv = gu[:2]
        adv = gv @ v  # (grad v) v
        div_v = gv[0, 0] + gv[1, 1]
        return jnp.concatenate([adv, jnp.array([div_v], dtype=u.dtype)])

    return VectorGalerkinForm(
        ncomp=3,
        flux=flux,
        source=source,
        quad_degree=3,
        symmetric=False,
        cell_coefficients={"h": h},
    )


def _ns_bc(V: FunctionSpace) -> DirichletBC:
    n = V.dim
    x = V.dof_coords
    on_boundary = V.mesh.boundary_mask
    mask = np.zeros(3 * n, dtype=bool)
    value = np.zeros(3 * n)
    # vx = 0 on the whole boundary
    mask[:n] = on_boundary
    # vy = (x<eps) - (x>1-eps) on the whole boundary
    mask[n : 2 * n] = on_boundary
    g = (x[:, 0] < 1e-14).astype(float) - (x[:, 0] > 1 - 1e-14).astype(float)
    value[n : 2 * n] = np.where(on_boundary, g, 0.0)
    # pressure pinned at the origin corner (reference q_boundary pointwise bc)
    corner = int(np.argmin(x[:, 0] ** 2 + x[:, 1] ** 2))
    mask[2 * n + corner] = True
    return DirichletBC(mask=mask, value=value)


def steady_navier_stokes(
    V: FunctionSpace,
    Re: float = 100.0,
    continuation=(10.0, 40.0),
    newton_max_iter: int = 50,
):
    """Solve steady NS; returns (velocity (n, 2), pressure (n,), info).

    Reynolds continuation: solve at increasing Re, warm-starting Newton.
    """
    bc = _ns_bc(V)
    n = V.dim
    u = None
    m_dummy = jnp.zeros(V.dim)
    info = None
    for re_k in [r for r in continuation if r < Re] + [Re]:
        problem = VariationalPDEProblem(
            V,
            V,
            _ns_form(V, re_k),
            bc,
            is_fwd_linear=False,
            newton_max_iter=newton_max_iter,
            newton_rtol=1e-8,
        )
        u, info = problem.solve_fwd(m_dummy, u0=u)
    velocity = jnp.stack([u[:n], u[n : 2 * n]], axis=1)
    pressure = u[2 * n :]
    return velocity, pressure, info
