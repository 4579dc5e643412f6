"""Randomized matrix-free spectral algorithms in pure jnp.

TPU-native re-implementation of the hippylib randomized eigensolver contract
consumed by the reference (SURVEY.md section 2.4):

* ``double_pass``    ~ hp.doublePass      (randomized HEP)
* ``double_pass_g``  ~ hp.doublePassG     (randomized GHEP with B-inner product)
* ``accuracy_enhanced_svd`` ~ hp.accuracyEnhancedSVD (randomized SVD, power it.)

Everything operates on *blocks*: an operator is a callable
``matmat(X: (n, k)) -> (n, k)`` so applications are large MXU matmuls (or
batched PDE solves upstream), never per-column loops like the reference's
``MatMvMult`` (`hippyflow/collectives/collectiveOperator.py:75-97`).
Orthogonalization uses CholQR2 — two rounds of Cholesky-QR — which is
matmul-dominated (MXU-resident) and as stable as Householder QR for the
modest block sizes (rank + oversampling <~ 512) used here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .linalg import eigh_descending


def _chol_orth_once(Z, B_matmat):
    W = B_matmat(Z)
    G = Z.T @ W
    # Tiny diagonal regularization guards f32 breakdown for nearly dependent
    # probes; negligible at f64.
    eps = jnp.finfo(Z.dtype).eps
    G = G + (eps * jnp.trace(G) / G.shape[0]) * jnp.eye(G.shape[0], dtype=Z.dtype)
    L = jnp.linalg.cholesky(G)
    Q = jsl.solve_triangular(L, Z.T, lower=True).T  # Z L^{-T}
    return Q


def orthogonalize(Z, B_matmat=None, rounds: int = 2):
    """(B-)orthonormalize the columns of Z.

    Euclidean case: one Householder QR (rank-deficiency safe — a probe block
    whose image underfills the block span still yields a full orthonormal Q,
    like hp.MultiVector.orthogonalize()).  B-inner-product case: Householder
    pre-orthonormalization followed by CholQR^rounds in the B inner product;
    the pre-step bounds the Gram condition number by cond(B), which keeps the
    Cholesky safe, and the CholQR sweeps are MXU-resident matmuls.
    """
    Q, _ = jnp.linalg.qr(Z)
    if B_matmat is None:
        return Q
    for _ in range(rounds):
        Q = _chol_orth_once(Q, B_matmat)
    return Q


def double_pass(A_matmat, Omega, k: int, s: int = 1):
    """Randomized HEP of a symmetric operator: returns (d (k,), U (n, k)).

    Mirrors hp.doublePass semantics: ``s`` power applications of A to the
    probe block, orthonormalize, second pass forms the Rayleigh quotient
    T = Q^T A Q, eigendecomposition sorted descending, U = Q V_k.
    Used by the reference for POD (`PODProjector.py:369-376`) and the output
    active subspace (`activeSubspaceProjector.py:654`).
    """
    Q = Omega
    for _ in range(s):
        Q = A_matmat(Q)
    Q = orthogonalize(Q)
    AQ = A_matmat(Q)
    T = Q.T @ AQ
    T = 0.5 * (T + T.T)
    d, V = eigh_descending(T)
    U = Q @ V[:, :k]
    return d[:k], U


def double_pass_g(A_matmat, B_matmat, Binv_matmat, Omega, k: int, s: int = 1):
    """Randomized GHEP  A u = lambda B u: returns (d (k,), U (n, k)) with U
    B-orthonormal.

    Mirrors hp.doublePassG: s applications of (B^{-1} A), B-orthonormalize,
    T = Q^T A Q, eigh descending, U = Q V_k. The reference calls this with
    (prior.R, prior.Rsolver) for the prior-preconditioned active subspace
    (`activeSubspaceProjector.py:449-450`) and (M, Msolver) for mass-orthogonal
    KLE (`KLEProjector.py:163-164`).
    """
    Q = Omega
    for _ in range(s):
        Q = Binv_matmat(A_matmat(Q))
    Q = orthogonalize(Q, B_matmat)
    AQ = A_matmat(Q)
    T = Q.T @ AQ
    T = 0.5 * (T + T.T)
    d, V = eigh_descending(T)
    U = Q @ V[:, :k]
    return d[:k], U


def lanczos_ghep(Ainv_matmat, B_matmat, v0, k: int, m_iters: int | None = None):
    """Smallest-eigenpair GHEP  A v = lambda B v  via shift-invert Lanczos.

    TPU-native replacement for the reference's SLEPc Krylov-Schur
    shift-and-invert solve at shift 0 (`hippyflow/modeling/KLEProjector.py:
    296-316`): Lanczos on T = A^{-1} B, which is self-adjoint in the B inner
    product, with full reorthogonalization (one block matmul per iteration —
    MXU-resident, numerically equivalent to Krylov-Schur's restarts at these
    subspace sizes). Eigenvalues of T are 1/lambda, so its largest Ritz pairs
    are the smallest GHEP eigenpairs.

    Args:
        Ainv_matmat: applies A^{-1} to an (n, j) block.
        B_matmat: applies B to an (n, j) block.
        v0: (n,) start vector (nonzero).
        k: number of requested eigenpairs.
        m_iters: Krylov dimension (default 2k + 10, capped at n).

    Returns (lam (k,) ascending, V (n, k)) with V B-orthonormal.
    """
    n = v0.shape[0]
    m = min(m_iters or (2 * k + 10), n)
    dtype = v0.dtype

    Bv0 = B_matmat(v0[:, None])[:, 0]
    v0 = v0 / jnp.sqrt(v0 @ Bv0)

    def step(carry, j):
        V, BV, beta_prev = carry
        vj = V[:, j]
        w = Ainv_matmat(B_matmat(vj[:, None]))[:, 0]
        alpha = w @ BV[:, j]
        # full reorthogonalization in the B inner product (two sweeps)
        for _ in range(2):
            w = w - V @ (BV.T @ w)
        Bw = B_matmat(w[:, None])[:, 0]
        beta = jnp.sqrt(jnp.maximum(w @ Bw, jnp.finfo(dtype).tiny))
        v_next = w / beta
        V = V.at[:, j + 1].set(v_next)
        BV = BV.at[:, j + 1].set(Bw / beta)
        return (V, BV, beta), (alpha, beta)

    V = jnp.zeros((n, m + 1), dtype=dtype).at[:, 0].set(v0)
    BV = jnp.zeros((n, m + 1), dtype=dtype).at[:, 0].set(B_matmat(v0[:, None])[:, 0])
    (V, BV, _), (alphas, betas) = jax.lax.scan(
        step, (V, BV, jnp.zeros((), dtype)), jnp.arange(m)
    )
    T = (
        jnp.diag(alphas)
        + jnp.diag(betas[:-1], 1)
        + jnp.diag(betas[:-1], -1)
    )
    theta, Y = eigh_descending(T)  # theta ~ 1/lambda, descending
    lam = 1.0 / theta[:k]
    Vk = V[:, :m] @ Y[:, :k]
    return lam, Vk


def accuracy_enhanced_svd(A_matmat, At_matmat, Omega, k: int, s: int = 1):
    """Randomized SVD of a rectangular operator A (dq, dm) with power
    iteration and re-orthogonalization.

    Omega: (dm, k + oversampling) probe block.
    Returns (U (dq, k), sigma (k,), V (dm, k)).

    Mirrors hp.accuracyEnhancedSVD, used for per-sample low-rank Jacobians
    (`activeSubspaceProjector.py:816`, `dataGenerator.py:187`).
    """
    Q = orthogonalize(A_matmat(Omega))  # (dq, j)
    for _ in range(s):
        Z = orthogonalize(At_matmat(Q))  # (dm, j)
        Q = orthogonalize(A_matmat(Z))
    Bt = At_matmat(Q)  # (dm, j) = A^T Q
    V_full, sigma, Ut_hat = jnp.linalg.svd(Bt, full_matrices=False)
    U = Q @ Ut_hat.T
    return U[:, :k], sigma[:k], V_full[:, :k]
