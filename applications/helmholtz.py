"""Frequency-domain acoustic Helmholtz with PML absorbing layers.

Port of `applications/helmholtz_2d/HelmholtzProblem.py` +
`helmholtz_linear_observable.py` (reference): complex field split into a
2-component real state (u1, u2) on a rectangle with quadratic-profile PML
stretching functions

    sigma_x = (x<xL) A (x-xL)^2/tL^2 + (x>xR) A (x-xR)^2/tR^2      (A = 50)

and wavenumber  k = (omega / (c rho)) e^m.  The reference splits the weak
form into physical (dx(1)) and PML (dx(0)) measures, but the PML tensors
reduce to the identity/zero exactly where sigma = 0, so a single unified
form over the whole domain is algebraically identical
(`HelmholtzProblem.py:84-115`) — here sigma is evaluated in closed form at
each quadrature point (exact, no sub-domain bookkeeping).

The point source is a unit delta at a point near the top boundary applied to
the real component (`HelmholtzProblem.py:56-63`), entering through the
problem's ``rhs_vector``.  The observable reads BOTH components at a target
grid near the source, matching hp.assemblePointwiseObservation on the vector
space (`helmholtz_linear_observable.py:92`).

State discretization note: the state defaults to P2 Lagrange elements
(``state_degree=2``), matching the reference's VectorFunctionSpace of
degree 2 (`helmholtz_linear_observable.py:40`); pass ``state_degree=1`` for
a cheaper P1 state on correspondingly finer meshes.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from hippyflow_tpu.fem import (
    DirichletBC,
    FunctionSpace,
    assemble_pointwise_observation,
    rectangle_mesh,
)
from hippyflow_tpu.fem.vector_assembly import VectorGalerkinForm
from hippyflow_tpu.models import (
    BiLaplacian2D,
    LaplacianPrior,
    LinearStateObservable,
    VariationalPDEProblem,
)

SPEED_OF_SOUND = 343.4  # m/s   (`helmholtz_linear_observable.py:67`)
AIR_DENSITY = 1.204  # kg/m^3

BOX = (0.0, 0.0, 3.0, 3.0)
BOX_PML = (-1.0, -1.0, 4.0, 3.0)
PML_A = 50.0


class VectorPointwiseObservation:
    """All components of a vector state observed at target points.

    Layout: q[t * ncomp + k] = u_k(x_t), dense (nt*ncomp, n*ncomp)."""

    materializable = True

    def __init__(self, space: FunctionSpace, targets, ncomp: int, dtype=None):
        Bs = assemble_pointwise_observation(space, np.asarray(targets))
        nt, n = Bs.shape
        Bfull = np.zeros((nt * ncomp, n * ncomp))
        for k in range(ncomp):
            Bfull[k::ncomp, k * n : (k + 1) * n] = Bs
        self.B = jnp.asarray(Bfull, dtype=dtype)
        self.targets = np.asarray(targets)

    @property
    def dim(self):
        return self.B.shape[0]

    @property
    def state_dim(self):
        return self.B.shape[1]

    def apply(self, u):
        return self.B @ u

    def applyt(self, q):
        return self.B.T @ q

    def dense(self):
        return self.B


def _sigma(x, lo, hi, t_lo, t_hi):
    below = jnp.where(x < lo, PML_A * (x - lo) ** 2 / t_lo**2, 0.0)
    above = jnp.where(x > hi, PML_A * (x - hi) ** 2 / t_hi**2, 0.0)
    return below + above


def helmholtz_form(wave_number: float, box=BOX, box_pml=BOX_PML) -> VectorGalerkinForm:
    t = [box_pml[i] - box[i] for i in range(4)]
    t = [1.0 if abs(ti) < 1e-14 else abs(ti) for ti in t]

    def pml_tensors(x, m):
        k = wave_number * jnp.exp(m)
        ksq = k * k
        sx = _sigma(x[0], box[0], box[2], t[0], t[2])
        sy = _sigma(x[1], box[1], box[3], t[1], t[3])
        Dr = jnp.array(
            [
                (ksq + sx * sy) / (ksq + sx * sx),
                (ksq + sx * sy) / (ksq + sy * sy),
            ]
        )
        Di = jnp.array(
            [k * (sx - sy) / (ksq + sx * sx), k * (sy - sx) / (ksq + sy * sy)]
        )
        Kr = ksq - sx * sy
        Ki = -k * (sx + sy)
        return Dr, Di, Kr, Ki

    def flux(x, u, gu, m, z, c):
        Dr, Di, Kr, Ki = pml_tensors(x, m)
        F1 = Dr * gu[0] + Di * gu[1]
        F2 = -Dr * gu[1] + Di * gu[0]
        return jnp.stack([F1, F2])

    def source(x, u, gu, m, z, c):
        Dr, Di, Kr, Ki = pml_tensors(x, m)
        S1 = -Kr * u[0] - Ki * u[1]
        S2 = Kr * u[1] - Ki * u[0]
        return jnp.stack([S1, S2])

    return VectorGalerkinForm(
        ncomp=2, flux=flux, source=source, quad_degree=4, symmetric=False
    )


def helmholtz_linear_observable(
    nx: int = 64,
    ny: int | None = None,
    sqrt_n_obs: int = 10,
    frequency: float = 300.0,
    box=BOX,
    box_pml=BOX_PML,
    state_degree: int = 2,
    **pde_kwargs,
):
    """Build the Helmholtz observable (reference
    `helmholtz_linear_observable.py:30-96`).

    State: (re, im) vector field on a P2 space (reference parity:
    `helmholtz_linear_observable.py:70` uses VectorFunctionSpace P2);
    parameter: P1.  Returns (observable, Vh) with Vh the PARAMETER space —
    the space priors and reduced bases live on; the state space is
    ``observable.problem.Vu``."""
    if ny is None:
        ny = int(round(nx * (box_pml[3] - box_pml[1]) / (box_pml[2] - box_pml[0])))
    mesh = rectangle_mesh(nx, ny, box_pml[0], box_pml[1], box_pml[2], box_pml[3])
    Vu = FunctionSpace(mesh, degree=state_degree)
    Vh = FunctionSpace(mesh)  # P1 parameter space
    n = Vu.dim

    omega = 2.0 * math.pi * frequency
    wave_number = omega / (SPEED_OF_SOUND * AIR_DENSITY)

    # unit point source on the real component near the top boundary
    source_loc = ((box[0] + 0.1 + (box[2] - 0.1) / 2) / 2, box[3] - 0.15)
    b_row = assemble_pointwise_observation(Vu, np.array([source_loc]))[0]
    rhs = np.zeros(2 * n)
    rhs[:n] = b_row  # delta source: rhs_i = phi_i(x_s) on component 0
    # no Dirichlet conditions: PML absorbs outgoing waves
    bc = DirichletBC(mask=np.zeros(2 * n, dtype=bool), value=np.zeros(2 * n))

    pde = VariationalPDEProblem(
        Vu,
        Vh,
        helmholtz_form(wave_number, box, box_pml),
        bc,
        is_fwd_linear=True,
        rhs_vector=rhs,
        # the split form [[P, Q], [Q, -P]] (helmholtz_form: the imaginary
        # equation is sign-flipped) assembles to A^T = A — indefinite, so
        # no Cholesky, but an adjoint factor serves forward solves and the
        # AS pipeline runs the fused one-factorization-per-sample pass
        operator_symmetric=pde_kwargs.pop("operator_symmetric", True),
        **pde_kwargs,
    )

    obs_length = 0.2
    x_targets = np.linspace(
        source_loc[0] - obs_length, source_loc[0] + obs_length, sqrt_n_obs
    )
    y_targets = np.linspace(
        box[3] - 0.05 - obs_length, box[3] - obs_length + 0.15, sqrt_n_obs
    )
    targets = np.array([(xi, yi) for xi in x_targets for yi in y_targets])
    B = VectorPointwiseObservation(Vu, targets, ncomp=2)
    return LinearStateObservable(pde, B), Vh


def helmholtz_prior(Vh, gamma: float = 1.0, delta: float = 5.0, use_bilaplacian=True):
    """Prior with the driver defaults (`helmholtz_problem_setup.py:42-55`)."""
    if use_bilaplacian:
        return BiLaplacian2D(Vh, gamma=gamma, delta=delta)
    return LaplacianPrior(Vh, gamma, delta)
