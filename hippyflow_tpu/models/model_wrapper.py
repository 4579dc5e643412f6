"""Inverse-problem model wrapper.

Port of `hippyflow/modeling/hippylibModelWrapper.py:42-369`: convenience
layer exposing observable evaluations, misfit costs/gradients, Jacobian and
Gauss-Newton Hessian actions, prior sampling, and synthetic-data setup for an
inverse problem  min_m  0.5/sigma^2 ||B u(m) - d||^2 + 0.5 ||m - m0||_R^2.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import KeyChain, ParameterList
from .jacobian import ObservableJacobian
from .observable import LinearStateObservable


def modelWrapperSettings() -> ParameterList:
    """Mirrors `hippylibModelWrapper.py:28-38`."""
    return ParameterList(
        {
            "seed": [0, "RNG seed (separate from sampling streams)"],
            "rel_noise": [None, "Relative noise for inverse problem data"],
        }
    )


@dataclass
class PointwiseMisfit:
    """Quadratic misfit 0.5/sigma^2 ||B u - d||^2 (hp.Misfit analog)."""

    d: jax.Array
    noise_variance: float


class ModelWrapper:
    """Observable + prior + misfit bundle with gradient/Hessian actions."""

    def __init__(
        self,
        observable: LinearStateObservable,
        prior,
        misfit: PointwiseMisfit | None = None,
        settings: ParameterList | None = None,
    ):
        self.observable = observable
        self.prior = prior
        self.misfit = misfit
        self.settings = settings or modelWrapperSettings()
        self.keychain = KeyChain(self.settings["seed"])
        self.J = ObservableJacobian(observable)
        self.dQ, self.dM = self.J.shape
        self.mtrue = None

    # -- forward / misfit ------------------------------------------------------
    def evalObs(self, m, u0=None):
        return self.observable.eval(m, u0=u0)

    def evalMisfit(self, m, u0=None):
        assert self.misfit is not None
        q = self.evalObs(m, u0=u0)
        return (q - self.misfit.d) / self.misfit.noise_variance

    def evalMisfitCost(self, m, u0=None):
        assert self.misfit is not None
        q = self.evalObs(m, u0=u0)
        r = q - self.misfit.d
        return 0.5 / self.misfit.noise_variance * jnp.dot(r, r)

    def evalRegularizationCost(self, m):
        dm = m - self.prior.mean
        return 0.5 * jnp.dot(dm, self.prior.R_matmat(dm[:, None])[:, 0])

    def evalCost(self, m, u0=None):
        return self.evalMisfitCost(m, u0=u0) + self.evalRegularizationCost(m)

    # -- gradients ----------------------------------------------------------
    def evalVariationalGradient(self, m, u0=None, misfit_only: bool = True):
        """dJ/dm = J^T (q - d)/sigma^2 [+ R (m - m0)] — the adjoint-based
        gradient (`hippylibModelWrapper.py:119-155`)."""
        assert self.misfit is not None
        lin = self.observable.linearize(m, u0=u0)
        q = self.observable.evalu(lin.u)
        mg = self.J.transpmult(
            lin, (q - self.misfit.d) / self.misfit.noise_variance
        )
        if not misfit_only:
            mg = mg + self.evalRegularizationGradient(m)
        return mg

    def evalRegularizationGradient(self, m):
        return self.prior.R_matmat((m - self.prior.mean)[:, None])[:, 0]

    def evalGradient(self, m, u0=None, misfit_only=True, invert_regularization=False):
        """Mass- or regularization-preconditioned gradient
        (`hippylibModelWrapper.py:157-168`)."""
        mg = self.evalVariationalGradient(m, u0=u0, misfit_only=misfit_only)
        if invert_regularization:
            return self.invertRegularization(mg)
        return self.invertMassMatrix(mg)

    def invertMassMatrix(self, rhs):
        return self.prior.Msolver_matmat(rhs[:, None])[:, 0]

    def invertRegularization(self, rhs):
        return self.prior.Rsolver_matmat(rhs[:, None])[:, 0]

    # -- Jacobian actions -----------------------------------------------------
    def evalJ(self, mhat, m=None, lin=None):
        if lin is None:
            lin = self.observable.linearize(m)
        return self.J.mult(lin, mhat)

    def evalJt(self, qhat, m=None, lin=None):
        if lin is None:
            lin = self.observable.linearize(m)
        return self.J.transpmult(lin, qhat)

    def evalGNHessian(self, mhat, m=None, lin=None):
        """Gauss-Newton Hessian action J^T Sigma^{-1} J mhat."""
        assert self.misfit is not None
        if lin is None:
            lin = self.observable.linearize(m)
        return self.J.transpmult(
            lin, self.J.mult(lin, mhat) / self.misfit.noise_variance
        )

    def evalJacobian(self, m=None, lin=None):
        """Dense Jacobian (`hippylibModelWrapper.py` evalJacobian via J^T I)."""
        if lin is None:
            lin = self.observable.linearize(m)
        return self.J.materialize(lin)

    def evalLowRankJacobian(self, rank: int, m=None, lin=None):
        """Truncated SVD of the Jacobian at m."""
        Jd = self.evalJacobian(m=m, lin=lin)
        U, s, Vt = jnp.linalg.svd(Jd, full_matrices=False)
        return U[:, :rank], s[:rank], Vt.T[:, :rank]

    # -- sampling / inverse-problem setup ------------------------------------
    def samplePrior(self, n: int = 1):
        return self.prior.sample_n(self.keychain.next_key(), n)

    def setUpInverseProblem(self, mtrue=None, rel_noise: float | None = None):
        """Synthesize noisy observation data at a (drawn or given) true
        parameter (`hippylibModelWrapper.py:340-369`)."""
        rel_noise = rel_noise or self.settings["rel_noise"]
        assert rel_noise is not None, "set rel_noise"
        if mtrue is None:
            mtrue = self.samplePrior(1)[0]
        self.mtrue = mtrue
        q_true = self.evalObs(mtrue)
        MAX = jnp.abs(q_true).max()
        noise_std = float(rel_noise * MAX)
        noise = noise_std * jax.random.normal(
            self.keychain.next_key(), q_true.shape, dtype=q_true.dtype
        )
        self.misfit = PointwiseMisfit(d=q_true + noise, noise_variance=noise_std**2)
        return self.misfit
