"""Prior algebra tests: operator identities and sampling covariance."""

import jax
import jax.numpy as jnp
import numpy as np

from hippyflow_tpu.fem import FunctionSpace, unit_square_mesh
from hippyflow_tpu.models import BiLaplacianPrior, LaplacianPrior


def _V(n=12):
    return FunctionSpace(unit_square_mesh(n))


def test_bilaplacian_r_rsolver_inverse():
    V = _V()
    prior = BiLaplacianPrior(V, gamma=0.1, delta=1.0, robin_bc=True)
    X = jax.random.normal(jax.random.PRNGKey(0), (V.dim, 5))
    err = jnp.linalg.norm(prior.R_matmat(prior.Rsolver_matmat(X)) - X)
    assert float(err / jnp.linalg.norm(X)) < 1e-10


def test_bilaplacian_sampling_covariance_exact():
    """The sampling map S: xi -> K^{-1} L_M xi satisfies S S^T = C = R^{-1}
    by construction — verified algebraically, no Monte Carlo needed."""
    V = _V(8)
    prior = BiLaplacianPrior(V, gamma=0.2, delta=2.0)
    n = V.dim
    S = prior._K_chol.solve(prior.sqrtM_matmat(jnp.eye(n)))
    C = prior.Rsolver_matmat(jnp.eye(n))
    assert float(jnp.abs(S @ S.T - C).max() / jnp.abs(C).max()) < 1e-10


def test_laplacian_sampling_covariance_exact():
    V = _V(8)
    prior = LaplacianPrior(V, gamma=0.3, delta=1.5)
    n = V.dim
    S = jax.scipy.linalg.solve_triangular(
        prior._R_chol.L, jnp.eye(n), lower=True, trans=1
    )
    C = prior.Rsolver_matmat(jnp.eye(n))
    assert float(jnp.abs(S @ S.T - C).max() / jnp.abs(C).max()) < 1e-10


def test_sample_shapes_and_mean():
    V = _V(8)
    mean = jnp.full(V.dim, 3.0)
    prior = BiLaplacianPrior(V, gamma=0.1, delta=1.0, mean=mean)
    m1 = prior.sample(jnp.zeros(V.dim))
    assert float(jnp.abs(m1 - mean).max()) == 0.0
    ms = prior.sample_n(jax.random.PRNGKey(1), 7)
    assert ms.shape == (7, V.dim)
    # empirical mean approaches the prior mean
    big = prior.sample_n(jax.random.PRNGKey(2), 4000)
    assert float(jnp.abs(big.mean(axis=0) - mean).max()) < 0.5


def test_anisotropy_changes_spectrum():
    V = _V(8)
    p_iso = BiLaplacianPrior(V, 0.1, 1.0, theta0=1.0, theta1=1.0)
    p_aniso = BiLaplacianPrior(V, 0.1, 1.0, theta0=4.0, theta1=0.25)
    assert float(jnp.abs(p_iso.K - p_aniso.K).max()) > 1e-8
