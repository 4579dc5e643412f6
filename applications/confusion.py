"""Confusion problem: advection-reaction-diffusion with cubic nonlinearity.

Port of `applications/confusion/confusion_linear_observable.py` (reference):

    (h/|v|) (v . grad u)(v . grad p) dx      SUPG-like stabilization
  + k grad(u) . grad(p) dx                  diffusion, k = 0.01
  + (v . grad u) p dx                       advection
  + c e^m u^3 p dx                          cubic reaction, c = 1
  - f p dx                                  Gaussian-blob source

with homogeneous Dirichlet BCs, 100 pointwise observations on a grid in
[0.6, 0.8]^2, and a BiLaplacian prior.

Velocity field: the reference solves steady Navier-Stokes at Re=100 in a
cavity driven up the left wall and down the right wall
(`confusion_linear_observable.py:51-82`).  Three options here:

* velocity='navier_stokes' (default, reference parity) — solve the same
  steady NS problem with the framework's stabilized P1 solver
  (applications/navier_stokes.py) at a one-time setup cost;
* velocity='analytic' — the divergence-free single-cell
  stream-function vortex psi = -(1/pi) sin(pi x) sin(pi y),
  v = (-sin(pi x) cos(pi y), cos(pi x) sin(pi y)), which matches the
  driven-cavity circulation direction and wall tangency (v.n = 0 on all
  walls; +y at x=0, -y at x=1) without the setup solve;
* velocity=<(n, 2) array> — precomputed dof values (e.g. an NS solve
  cached across benchmark workers so every process sees bitwise-identical
  coefficients).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hippyflow_tpu.fem import (
    DirichletBC,
    FunctionSpace,
    GalerkinForm,
    grid_targets,
    unit_square_mesh,
)
from hippyflow_tpu.models import (
    BiLaplacian2D,
    LinearStateObservable,
    PointwiseObservation,
    VariationalPDEProblem,
)


def confusion_velocity(V: FunctionSpace, kind="navier_stokes") -> np.ndarray:
    """(n, 2) P1 dof values of the cavity-circulation velocity field.

    kind='navier_stokes': solve the reference's steady NS problem at Re=100
    (`confusion_linear_observable.py:51-82`) — exact parity, one-time setup
    cost. kind='analytic': the stream-function vortex described above.
    kind=<array>: precomputed dof values, used verbatim."""
    if not isinstance(kind, str):
        vel = np.asarray(kind)
        assert vel.shape == (V.dim, 2), f"velocity array shape {vel.shape}"
        return vel
    if kind == "navier_stokes":
        from applications.navier_stokes import steady_navier_stokes

        v, _, info = steady_navier_stokes(V, Re=100.0)
        assert bool(info.converged), "NS velocity solve did not converge"
        return np.asarray(v)
    x = V.dof_coords
    vx = -np.sin(np.pi * x[:, 0]) * np.cos(np.pi * x[:, 1])
    vy = np.cos(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
    return np.stack([vx, vy], axis=1)


def confusion_source(V: FunctionSpace) -> np.ndarray:
    """Gaussian blob rhs f = max(0.5, exp(-25 |x - (0.7, 0.7)|^2)),
    interpolated on the state space (`confusion_linear_observable.py:36`)."""
    x = V.dof_coords
    blob = np.exp(-25.0 * ((x[:, 0] - 0.7) ** 2 + (x[:, 1] - 0.7) ** 2))
    return np.maximum(0.5, blob)


def confusion_form(
    V: FunctionSpace, c: float = 1.0, k: float = 0.01, velocity="navier_stokes"
) -> GalerkinForm:
    vel = confusion_velocity(V, kind=velocity)
    f = confusion_source(V)
    h = V.mesh.cell_diameters()

    def flux(x, u, gu, m, z, coef):
        v = coef["vel"]
        v_norm = jnp.sqrt(jnp.dot(v, v) + 1e-6)
        # SUPG-like term: (h/|v|)(v.grad u) v . grad p  + diffusion k grad u
        return (coef["h"] / v_norm) * jnp.dot(v, gu) * v + k * gu

    def source(x, u, gu, m, z, coef):
        return jnp.dot(coef["vel"], gu) + c * jnp.exp(m) * u**3 - coef["f"]

    return GalerkinForm(
        flux=flux,
        source=source,
        quad_degree=4,
        symmetric=False,  # advection: LU path
        coefficients={"vel": vel, "f": f},
        cell_coefficients={"h": h},
    )


def confusion_linear_observable(
    nx: int = 64,
    sqrt_n_obs: int = 10,
    c: float = 1.0,
    k: float = 0.01,
    newton_max_iter: int = 25,
    velocity="navier_stokes",
    n_line_search: int = 4,
    **pde_kwargs,
):
    """Build the confusion observable (reference
    `confusion_linear_observable.py:27-150`). Returns (observable, Vh).

    velocity='navier_stokes' reproduces the reference's NS-computed field.
    Extra kwargs (solver, newton_stale_factor, n_line_search, ...) pass
    through to VariationalPDEProblem."""
    mesh = unit_square_mesh(nx)
    Vh = FunctionSpace(mesh)
    bc = DirichletBC.from_predicate(Vh, None, 0.0)
    pde = VariationalPDEProblem(
        Vh,
        Vh,
        confusion_form(Vh, c=c, k=k, velocity=velocity),
        bc,
        is_fwd_linear=False,
        newton_max_iter=newton_max_iter,
        # measured on-chip (benchmarks/probe_newton_variants.py): a 4-step
        # backtracking ladder minimizes wall time (8 wastes residual evals,
        # <=3 raises the worst-lane iteration count that the vmapped
        # while_loop pays for)
        n_line_search=n_line_search,
        **pde_kwargs,
    )
    targets = grid_targets(0.6, 0.8, sqrt_n_obs)
    B = PointwiseObservation(Vh, targets)
    return LinearStateObservable(pde, B), Vh


def confusion_prior(Vh: FunctionSpace, gamma: float = 0.1, delta: float = 1.0):
    """BiLaplacian prior with the driver's defaults
    (`confusion_problem_setup.py:44-48`).  Beyond ~20k dofs the banded
    StructuredBiLaplacianPrior replaces the dense one (same distribution,
    O(n s) memory — required for the reference's nx=192 config)."""
    if Vh.mesh.structured_shape is not None and Vh.dim > 20000:
        from hippyflow_tpu.models import StructuredBiLaplacianPrior

        return StructuredBiLaplacianPrior(
            Vh, gamma=gamma, delta=delta, materialize=False
        )
    return BiLaplacian2D(Vh, gamma=gamma, delta=delta)
