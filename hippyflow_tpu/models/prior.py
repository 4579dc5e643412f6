"""Gaussian Matern priors (hippylib BiLaplacianPrior / LaplacianPrior
equivalents — the external contract of `hippyflow/modeling/maternPrior.py`).

BiLaplacian prior
-----------------
With K = gamma * A_aniso + delta * M (+ optional Robin boundary mass), the
covariance and precision are

    C = K^{-1} M K^{-1},        R = C^{-1} = K M^{-1} K.

Sampling uses the exact square root  C^{1/2} = K^{-1} L_M  with  M = L_M L_M^T
(dense Cholesky of the mass matrix):  m = mean + K^{-1} (L_M xi), xi ~ N(0,I).
This reproduces hippylib's sqrt-mass sampling exactly in distribution.

Laplacian prior
---------------
R = gamma * A + delta * M directly;  C = R^{-1};  C^{1/2} = L_R^{-T}.

All operators are exposed as *block* callables ``(n, k) -> (n, k)`` backed by
cached dense Cholesky factorizations: on TPU each prior application inside
the randomized eigensolvers is a pair of batched triangular solves plus a
matmul, entirely MXU-resident.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np

from .. import config
from ..fem import FunctionSpace, mass_matrix, stiffness_matrix, boundary_mass_matrix
from ..ops.linalg import CholeskyFactor


def aniso_tensor_2d(theta0: float, theta1: float, alpha: float) -> np.ndarray:
    """Constant anisotropic diffusion tensor.

    Matches hippylib's compiled AnisTensor2D expression consumed by
    `hippyflow/modeling/maternPrior.py:24-27`:
        [t0 sin^2(a) + t1 cos^2(a)   (t0 - t1) sin(a) cos(a)]
        [(t0 - t1) sin(a) cos(a)     t0 cos^2(a) + t1 sin^2(a)]
    """
    sa, ca = math.sin(alpha), math.cos(alpha)
    return np.array(
        [
            [theta0 * sa * sa + theta1 * ca * ca, (theta0 - theta1) * sa * ca],
            [(theta0 - theta1) * sa * ca, theta0 * ca * ca + theta1 * sa * sa],
        ]
    )


class _GaussianPriorBase:
    """Shared machinery: mass matrix + factorizations + block operators."""

    Vh: FunctionSpace

    def _init_mass(self, dtype):
        self.M = mass_matrix(self.Vh, dtype=dtype)
        self._M_chol = CholeskyFactor(L=jnp.linalg.cholesky(self.M))

    # --- mass operators ---------------------------------------------------
    def M_matmat(self, X):
        return self.M @ X

    def Msolver_matmat(self, X):
        return self._M_chol.solve(X)

    def sqrtM_matmat(self, X):
        """L_M @ X with M = L_M L_M^T."""
        return self._M_chol.matvec_L(X)

    @property
    def dim(self) -> int:
        return self.Vh.dim

    @property
    def noise_dim(self) -> int:
        return self.Vh.dim


class BiLaplacianPrior(_GaussianPriorBase):
    """Matern-like Gaussian prior with BiLaplacian precision.

    Reference factory: BiLaplacian2D (`hippyflow/modeling/maternPrior.py:19`).
    """

    def __init__(
        self,
        Vh: FunctionSpace,
        gamma: float,
        delta: float,
        theta0: float = 2.0,
        theta1: float = 0.5,
        alpha: float = math.pi / 4.0,
        mean=None,
        robin_bc: bool = False,
        dtype=None,
    ):
        dtype = dtype or config.default_dtype()
        self.Vh = Vh
        self.gamma, self.delta = float(gamma), float(delta)
        self._init_mass(dtype)
        A = stiffness_matrix(Vh, aniso_tensor_2d(theta0, theta1, alpha), dtype=dtype)
        K = self.gamma * A + self.delta * self.M
        if robin_bc:
            # hippylib Robin correction beta = sqrt(gamma*delta)/1.42 reduces
            # boundary variance inflation.
            beta = math.sqrt(self.gamma * self.delta) / 1.42
            K = K + beta * boundary_mass_matrix(Vh, dtype=dtype)
        self.K = K
        # hippylib exposes the sqrt-precision operator as prior.A
        # (`KLEProjector.py:296`): keep the alias.
        self.A = K
        # On structured meshes K is block-tridiagonal: block-Thomas replaces
        # the dense Cholesky for all K-solves (sampling, Rsolver).
        if Vh.mesh.structured_shape is not None:
            from ..ops.structured import factorize_block_tridiag_dense

            self._K_chol = factorize_block_tridiag_dense(
                K, Vh.mesh.structured_shape[0] + 1
            )
        else:
            self._K_chol = CholeskyFactor(L=jnp.linalg.cholesky(K))
        if mean is None:
            mean = jnp.zeros(Vh.dim, dtype=dtype)
        self.mean = jnp.asarray(mean, dtype=dtype)

    # --- precision / covariance blocks -------------------------------------
    def R_matmat(self, X):
        """R @ X = K M^{-1} K X."""
        return self.K @ self._M_chol.solve(self.K @ X)

    def Rsolver_matmat(self, X):
        """R^{-1} @ X = K^{-1} M K^{-1} X (this is also C @ X)."""
        return self._K_chol.solve(self.M @ self._K_chol.solve(X))

    def C_matmat(self, X):
        return self.Rsolver_matmat(X)

    def Ksolver_matmat(self, X):
        return self._K_chol.solve(X)

    def sample(self, noise):
        """Map white noise (..., n) to prior samples: mean + K^{-1} L_M xi.

        noise may be (n,) or batched (N, n); returns matching shape.
        """
        noise = jnp.asarray(noise, dtype=self.mean.dtype)
        batched = noise.ndim == 2
        xi = noise.T if batched else noise[:, None]
        m = self._K_chol.solve(self.sqrtM_matmat(xi))
        m = m.T if batched else m[:, 0]
        return self.mean + m

    def sample_n(self, key, n: int):
        import jax

        noise = jax.random.normal(key, (n, self.noise_dim), dtype=self.mean.dtype)
        return self.sample(noise)


class LaplacianPrior(_GaussianPriorBase):
    """Gaussian prior with Laplacian precision R = gamma A + delta M.

    Reference factory: Laplacian2D (`hippyflow/modeling/maternPrior.py:32`).
    Note: the anisotropy arguments are accepted for API parity but — exactly
    like the reference, which drops `anis_diff` when calling
    hp.LaplacianPrior — the stiffness is isotropic.
    """

    def __init__(
        self,
        Vh: FunctionSpace,
        gamma: float,
        delta: float,
        mean=None,
        dtype=None,
    ):
        dtype = dtype or config.default_dtype()
        self.Vh = Vh
        self.gamma, self.delta = float(gamma), float(delta)
        self._init_mass(dtype)
        A = stiffness_matrix(Vh, None, dtype=dtype)
        self.R = self.gamma * A + self.delta * self.M
        self.A = self.R
        self._R_chol = CholeskyFactor(L=jnp.linalg.cholesky(self.R))
        if mean is None:
            mean = jnp.zeros(Vh.dim, dtype=dtype)
        self.mean = jnp.asarray(mean, dtype=dtype)

    def R_matmat(self, X):
        return self.R @ X

    def Rsolver_matmat(self, X):
        return self._R_chol.solve(X)

    def C_matmat(self, X):
        return self.Rsolver_matmat(X)

    def sample(self, noise):
        """m = mean + L_R^{-T} xi so that Cov = R^{-1}."""
        noise = jnp.asarray(noise, dtype=self.mean.dtype)
        batched = noise.ndim == 2
        xi = noise.T if batched else noise[:, None]
        m = jsl.solve_triangular(self._R_chol.L, xi, lower=True, trans=1)
        m = m.T if batched else m[:, 0]
        return self.mean + m

    def sample_n(self, key, n: int):
        import jax

        noise = jax.random.normal(key, (n, self.noise_dim), dtype=self.mean.dtype)
        return self.sample(noise)


def BiLaplacian2D(
    Vh,
    gamma: float = 0.1,
    delta: float = 0.1,
    theta0: float = 2.0,
    theta1: float = 0.5,
    alpha: float = math.pi / 4.0,
    mean=None,
    robin_bc: bool = False,
):
    """Reference-parity factory (`maternPrior.py:19-29`)."""
    return BiLaplacianPrior(
        Vh, gamma, delta, theta0, theta1, alpha, mean=mean, robin_bc=robin_bc
    )


def Laplacian2D(
    Vh,
    gamma: float = 0.1,
    delta: float = 0.1,
    theta0: float = 2.0,
    theta1: float = 0.5,
    alpha: float = math.pi / 4.0,
    mean=None,
):
    """Reference-parity factory (`maternPrior.py:32-41`)."""
    del theta0, theta1, alpha  # accepted but unused, as in the reference
    return LaplacianPrior(Vh, gamma, delta, mean=mean)
