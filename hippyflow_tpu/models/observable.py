"""Observables: q(m) = B u(m).

Mirrors `hippyflow/modeling/observable.py` (LinearStateObservable,
DomainRestrictedOperator) and `fullStateObservable.py`
(StateSpaceIdentityOperator).  A B-operator here is a tiny class with
``apply`` / ``applyt`` acting on vectors (n,) or blocks (n, k); the pointwise
case is a dense (n_obs, n_dof) matrix so observation is one matmul.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fem import FunctionSpace, assemble_pointwise_observation, mass_matrix
from .pde_problem import Linearization, VariationalPDEProblem


def _scale_rows(x, s):
    return x * (s if x.ndim == 1 else s[:, None])


class PointwiseObservation:
    """B from pointwise interpolation at target locations (reference:
    hp.assemblePointwiseObservation, used at `test_derivativeSubspace.py:72`)."""

    materializable = True  # dense() and applyt are consistent transposes

    def __init__(self, space: FunctionSpace, targets, dtype=None):
        Bnp = assemble_pointwise_observation(space, np.asarray(targets))
        self.B = jnp.asarray(Bnp, dtype=dtype)
        self.targets = np.asarray(targets)

    @property
    def dim(self) -> int:
        return self.B.shape[0]

    @property
    def state_dim(self) -> int:
        return self.B.shape[1]

    def apply(self, u):
        return self.B @ u

    def applyt(self, q):
        return self.B.T @ q

    def dense(self):
        return self.B


class StateSpaceIdentityOperator:
    """Full-state observable B = I; the transpose is the mass matrix when
    ``use_mass_matrix`` (M-adjoint), reproducing
    `hippyflow/modeling/fullStateObservable.py:18-53`."""

    # mult is the identity but transpmult is the M-adjoint: no single dense
    # matrix represents both, so Jacobians through this B stay matrix-free.
    materializable = False

    def __init__(self, space: FunctionSpace, use_mass_matrix: bool = True, dtype=None):
        self.space = space
        self.use_mass_matrix = use_mass_matrix
        self.M = mass_matrix(space, dtype=dtype) if use_mass_matrix else None

    @property
    def dim(self) -> int:
        return self.space.dim

    @property
    def state_dim(self) -> int:
        return self.space.dim

    def apply(self, u):
        return u

    def applyt(self, q):
        return self.M @ q if self.use_mass_matrix else q

    def dense(self):
        return jnp.eye(self.space.dim)


class DomainRestrictedOperator:
    """Zero out selected state fields before observing (reference:
    `observable.py:38-63`)."""

    def __init__(self, indicator, B):
        self.indicator = jnp.asarray(indicator)
        self.inner = B
        self.materializable = getattr(B, "materializable", True)

    @property
    def dim(self):
        return self.inner.dim

    @property
    def state_dim(self):
        return self.inner.state_dim

    def apply(self, u):
        return self.inner.apply(_scale_rows(u, self.indicator))

    def applyt(self, q):
        return _scale_rows(self.inner.applyt(q), self.indicator)

    def dense(self):
        return self.inner.dense() * self.indicator[None, :]


class LinearStateObservable:
    """q(m[, z]) = B u(m[, z]) (reference: `observable.py:66-323`).

    parameter_projection: optional (dM,) indicator (or projector matrix)
    restricting the parameter sensitivity to a subdomain before C is applied
    — the reference's optional projection in applyC/applyCt
    (`observable.py:263-297`)."""

    def __init__(self, problem: VariationalPDEProblem, B, parameter_projection=None):
        self.problem = problem
        self.B = B
        self.is_control_problem = problem.has_control
        self.parameter_projection = (
            None
            if parameter_projection is None
            else jnp.asarray(parameter_projection)
        )

    def _project_parameter(self, dm):
        P = self.parameter_projection
        if P is None:
            return dm
        if P.ndim == 1:  # indicator mask
            return _scale_rows(dm, P)
        return P @ dm

    def _project_parameter_t(self, g):
        P = self.parameter_projection
        if P is None:
            return g
        if P.ndim == 1:
            return _scale_rows(g, P)
        return P.T @ g

    @property
    def dQ(self) -> int:
        return self.B.dim

    @property
    def dM(self) -> int:
        return self.problem.Vm.dim

    def eval(self, m, z=None, u0=None):
        """Solve forward and observe. Pure function; vmap over m batches."""
        u, _ = self.problem.solve_fwd(m, z=z, u0=u0)
        return self.B.apply(u)

    def evalu(self, u):
        return self.B.apply(u)

    def solve_fwd(self, m, z=None, u0=None):
        return self.problem.solve_fwd(m, z=z, u0=u0)

    def linearize(self, m, z=None, u=None, u0=None):
        """Solve forward (if u not given) and factorize the linearized state
        operator: the combined solveFwd + setLinearizationPoint of the
        reference (`observable.py:166-188`, 219-231)."""
        if u is None:
            u, info = self.problem.solve_fwd(m, z=z, u0=u0)
        return self.problem.linearize(u, m, z)

    # -- reference-parity pass-throughs --------------------------------------
    def applyB(self, u):
        return self.B.apply(u)

    def applyBt(self, q):
        return self.B.applyt(q)

    def applyC(self, lin: Linearization, dm):
        return self.problem.apply_C(lin, self._project_parameter(dm))

    def applyCt(self, lin: Linearization, dp):
        return self._project_parameter_t(self.problem.apply_Ct(lin, dp))

    def applyCz(self, lin: Linearization, dz):
        return self.problem.apply_Cz(lin, dz)

    def applyCzt(self, lin: Linearization, dp):
        return self.problem.apply_Czt(lin, dp)

    def solveFwdIncremental(self, lin: Linearization, rhs):
        return self.problem.solve_incremental(lin, rhs, is_adj=False)

    def solveAdjIncremental(self, lin: Linearization, rhs):
        return self.problem.solve_incremental(lin, rhs, is_adj=True)
