"""Matrix-free and materialized observable Jacobians.

Reference semantics (`hippyflow/modeling/jacobian.py:117-139`):

    J  dm = -B A^{-1} C dm          (applyC -> incremental fwd solve -> applyB)
    J^T dq = -C^T A^{-T} B^T dq     (applyBt -> incremental adj solve -> applyCt)

Here the incremental solves are back-solves against the cached factorization
in a ``Linearization`` pytree, and C/C^T actions are jvp/vjp of the masked
residual — identical algebra, no hand-assembled KKT blocks.

TPU-first optimization: when the observation dimension dQ is small (pointwise
observables: 100 targets vs thousands of dofs), ``materialize`` forms the
dense (dQ, dM) Jacobian with ONE batched adjoint solve of dQ right-hand
sides.  Downstream Gauss-Newton expectations (J^T J, J J^T averages feeding
doublePassG) then become pure MXU matmuls with zero additional PDE solves —
this is what replaces the reference's 2 * n_samples * (rank + oversampling)
LU back-solves per eigensolver iteration (SURVEY.md section 3.1 hot loop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .observable import LinearStateObservable
from .pde_problem import Linearization


class ObservableJacobian:
    """J(m) = d(Bu)/dm at a linearization point."""

    def __init__(self, observable: LinearStateObservable):
        self.observable = observable

    @property
    def shape(self):
        return (self.observable.dQ, self.observable.dM)

    def mult(self, lin: Linearization, dm):
        """J @ dm for dm (dM,) or (dM, k)."""
        obs = self.observable
        rhs = obs.applyC(lin, dm)
        uhat = obs.solveFwdIncremental(lin, rhs)
        return -obs.applyB(uhat)

    def transpmult(self, lin: Linearization, dq):
        """J^T @ dq for dq (dQ,) or (dQ, k)."""
        obs = self.observable
        rhs = obs.applyBt(dq)
        phat = obs.solveAdjIncremental(lin, rhs)
        return -obs.applyCt(lin, phat)

    def materialize(self, lin: Linearization):
        """Dense J (dQ, dM) via one blocked adjoint solve (dQ rhs)."""
        obs = self.observable
        Bt = obs.B.dense().T  # (n_state, dQ)
        X = obs.solveAdjIncremental(lin, Bt)  # A^{-T} B^T
        Jt = -obs.applyCt(lin, X)  # (dM, dQ)
        return Jt.T


class ObservableControlJacobian:
    """dq/dz analog (reference: `hippyflow/modeling/controlJacobian.py:22-95`)."""

    def __init__(self, observable: LinearStateObservable):
        assert observable.is_control_problem
        self.observable = observable

    @property
    def shape(self):
        return (self.observable.dQ, self.observable.problem.control_dim)

    def mult(self, lin: Linearization, dz):
        obs = self.observable
        rhs = obs.applyCz(lin, dz)
        uhat = obs.solveFwdIncremental(lin, rhs)
        return -obs.applyB(uhat)

    def transpmult(self, lin: Linearization, dq):
        obs = self.observable
        rhs = obs.applyBt(dq)
        phat = obs.solveAdjIncremental(lin, rhs)
        return -obs.applyCzt(lin, phat)

    def materialize(self, lin: Linearization):
        obs = self.observable
        Bt = obs.B.dense().T
        X = obs.solveAdjIncremental(lin, Bt)
        Jzt = -obs.applyCzt(lin, X)
        return Jzt.T


def jtj_matmat(J: ObservableJacobian, lin: Linearization):
    """Gauss-Newton operator J^T J as a block callable (reference: JTJ,
    `jacobian.py:142-166`)."""
    return lambda X: J.transpmult(lin, J.mult(lin, X))


def jjt_matmat(J: ObservableJacobian, lin: Linearization):
    """J J^T block callable (reference: JJT, `jacobian.py:169-193`)."""
    return lambda X: J.mult(lin, J.transpmult(lin, X))
