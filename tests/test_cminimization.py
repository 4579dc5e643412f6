"""ConstrainedNSolver tests: quadratic exactness, nonlinear energy, Armijo."""

import jax
import jax.numpy as jnp
import numpy as np

from hippyflow_tpu.models import ConstrainedNSolver, newtonSolver_ParameterList


def test_quadratic_one_step():
    # min 0.5 u^T A u - b^T u : Newton converges in one iteration
    n = 12
    key = jax.random.PRNGKey(0)
    Q, _ = jnp.linalg.qr(jax.random.normal(key, (n, n)))
    A = Q @ jnp.diag(jnp.linspace(1, 5, n)) @ Q.T
    b = jax.random.normal(jax.random.PRNGKey(1), (n,))

    F = lambda u: 0.5 * u @ A @ u - b @ u
    C = lambda u: 0.0 * jnp.sum(u)
    solver = ConstrainedNSolver()
    u, reason = solver.solve(F, C, jnp.zeros(n), jnp.zeros(n))
    assert solver.converged
    np.testing.assert_allclose(
        np.asarray(u), np.asarray(jnp.linalg.solve(A, b)), rtol=1e-8
    )


def test_nonlinear_energy():
    # min sum(cosh(u)) + linear term: strictly convex
    n = 8
    b = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (n,))
    F = lambda u: jnp.sum(jnp.cosh(u)) - b @ u
    C = lambda u: 0.0
    solver = ConstrainedNSolver()
    u, reason = solver.solve(F, C, jnp.zeros(n), jnp.zeros(n))
    assert solver.converged
    # optimality: sinh(u) = b
    np.testing.assert_allclose(np.asarray(jnp.sinh(u)), np.asarray(b), atol=1e-7)


def test_linear_constraint_prestep():
    # energy plus a linear constraint term; first-iteration correction
    n = 6
    A = jnp.eye(n) * 2.0
    c_vec = jnp.ones(n)
    F = lambda u: 0.5 * u @ A @ u
    C = lambda u: 1.0 * jnp.dot(c_vec, u)  # linear constraint functional
    params = newtonSolver_ParameterList()
    params["print_level"] = -1
    solver = ConstrainedNSolver(params)
    u, reason = solver.solve(F, C, jnp.zeros(n), c_vec)
    assert solver.converged
    # stationarity of L = F + C: A u + c_vec = 0
    np.testing.assert_allclose(
        np.asarray(A @ u + c_vec), np.zeros(n), atol=1e-8
    )
