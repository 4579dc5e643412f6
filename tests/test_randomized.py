"""Randomized eigensolver/SVD parity against dense factorizations."""

import jax
import jax.numpy as jnp
import numpy as np

from hippyflow_tpu.ops import (
    accuracy_enhanced_svd,
    double_pass,
    double_pass_g,
    generalized_eigh,
    orthogonalize,
)


def _spd(key, n, decay=2.0):
    Q, _ = jnp.linalg.qr(jax.random.normal(key, (n, n)))
    d = jnp.asarray([1.0 / (i + 1) ** decay for i in range(n)])
    return Q @ jnp.diag(d) @ Q.T


def test_orthogonalize():
    Z = jax.random.normal(jax.random.PRNGKey(0), (50, 12))
    Q = orthogonalize(Z)
    assert float(jnp.abs(Q.T @ Q - jnp.eye(12)).max()) < 1e-12
    B = _spd(jax.random.PRNGKey(1), 50, decay=0.5) + jnp.eye(50)
    Qb = orthogonalize(Z, lambda X: B @ X)
    assert float(jnp.abs(Qb.T @ B @ Qb - jnp.eye(12)).max()) < 1e-12


def _spd_lowrank(key, n, rank, decay=2.0):
    Q, _ = jnp.linalg.qr(jax.random.normal(key, (n, rank)))
    d = jnp.asarray([1.0 / (i + 1) ** decay for i in range(rank)])
    return Q @ jnp.diag(d) @ Q.T


def test_double_pass_exact_on_low_rank():
    # When the operator rank is below the probe block size, the two-pass
    # randomized HEP is exact (up to roundoff).
    n, k = 80, 10
    A = _spd_lowrank(jax.random.PRNGKey(2), n, rank=15)
    Omega = jax.random.normal(jax.random.PRNGKey(3), (n, k + 10))
    d, U = double_pass(lambda X: A @ X, Omega, k, s=1)
    d_exact = jnp.linalg.eigh(A)[0][::-1][:k]
    assert float(jnp.abs(d - d_exact).max() / d_exact[0]) < 1e-12
    assert float(jnp.abs(U.T @ U - jnp.eye(k)).max()) < 1e-10
    res = jnp.linalg.norm(A @ U - U * d[None, :]) / jnp.linalg.norm(A @ U)
    assert float(res) < 1e-10


def test_double_pass_accuracy_on_full_rank_decay():
    # Full-rank operator with cubic decay: s=1 randomized accuracy.
    n, k = 80, 10
    A = _spd(jax.random.PRNGKey(2), n, decay=3.0)
    Omega = jax.random.normal(jax.random.PRNGKey(3), (n, k + 10))
    d, U = double_pass(lambda X: A @ X, Omega, k, s=1)
    d_exact = jnp.linalg.eigh(A)[0][::-1][:k]
    assert float(jnp.abs(d - d_exact).max() / d_exact[0]) < 1e-3


def test_double_pass_g_matches_generalized_eigh():
    n, k = 60, 8
    A = _spd_lowrank(jax.random.PRNGKey(4), n, rank=12, decay=3.0)
    B = _spd(jax.random.PRNGKey(5), n, decay=0.2) + 0.5 * jnp.eye(n)
    Binv = jnp.linalg.inv(B)
    Omega = jax.random.normal(jax.random.PRNGKey(6), (n, k + 12))
    d, U = double_pass_g(
        lambda X: A @ X, lambda X: B @ X, lambda X: Binv @ X, Omega, k, s=1
    )
    d_exact, _ = generalized_eigh(A, B)
    assert float(jnp.abs(d - d_exact[:k]).max() / d_exact[0]) < 1e-10
    # B-orthonormal
    assert float(jnp.abs(U.T @ B @ U - jnp.eye(k)).max()) < 1e-10
    # GHEP residual: A U = B U diag(d)
    res = jnp.linalg.norm(A @ U - (B @ U) * d[None, :]) / jnp.linalg.norm(A @ U)
    assert float(res) < 1e-5


def test_accuracy_enhanced_svd():
    dq, dm, k = 30, 100, 12
    key = jax.random.PRNGKey(7)
    U0, _ = jnp.linalg.qr(jax.random.normal(key, (dq, dq)))
    V0, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(8), (dm, dq)))
    s0 = jnp.asarray([2.0 ** (-i) for i in range(dq)])
    A = U0 @ jnp.diag(s0) @ V0.T
    Omega = jax.random.normal(jax.random.PRNGKey(9), (dm, k + 10))
    U, s, V = accuracy_enhanced_svd(
        lambda X: A @ X, lambda X: A.T @ X, Omega, k, s=1
    )
    assert float(jnp.abs(s - s0[:k]).max() / s0[0]) < 1e-9
    # reconstruction on the dominant subspace
    err = jnp.linalg.norm(U * s[None, :] @ V.T - A) / jnp.linalg.norm(A)
    assert float(err) < 1e-3
