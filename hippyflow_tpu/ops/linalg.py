"""Dense factorizations and solvers (TPU replacement for PETSc LU/MUMPS).

The reference bottoms out every solve in a sparse direct factorization
(`hp.PETScLUSolver`, `setupPoissonControlProblem.py:345-349`).  On TPU the
fast path for the reference's problem sizes (1e3-3e4 dofs) is a *dense*
factorization on the MXU: one O(n^3) factorization per sample amortized over
hundreds of O(n^2) back-solves (incremental forward/adjoint solves in the
randomized eigensolvers), all batched over samples with vmap.

Factor objects are NamedTuples (pytrees), so a batch of factorizations is
just a leading axis — `jax.vmap(factorize)(A_batch)` — and back-solves with
blocks of right-hand sides are batched triangular solves.

Beyond ~3e4 dofs dense factorization stops being the right tool; the
`cg_solve` entry point provides a matrix-free preconditioned CG fallback.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


class CholeskyFactor(NamedTuple):
    """Lower-Cholesky factor of an SPD matrix."""

    L: jax.Array

    def solve(self, b, trans: bool = False):
        # symmetric: A^T = A, trans is irrelevant
        return jsl.cho_solve((self.L, True), b)

    def solve_L(self, b):
        """Solve L x = b (useful for sqrt actions)."""
        return jsl.solve_triangular(self.L, b, lower=True)

    def matvec_L(self, x):
        """L @ x (sqrt action of A)."""
        return self.L @ x


class LUFactor(NamedTuple):
    """Pivoted LU factor of a general square matrix."""

    lu: jax.Array
    piv: jax.Array

    def solve(self, b, trans: bool = False):
        return jsl.lu_solve((self.lu, self.piv), b, trans=1 if trans else 0)


def factorize(A, symmetric: bool):
    """Factorize a dense matrix: Cholesky when SPD, pivoted LU otherwise."""
    if symmetric:
        L, _ = jsl.cho_factor(A, lower=True)
        return CholeskyFactor(L=L)
    lu, piv = jsl.lu_factor(A)
    return LUFactor(lu=lu, piv=piv)


def solve_refined(factor, A, b, iters: int = 0, trans: bool = False):
    """Back-solve with optional iterative refinement.

    On TPU, f32 factorizations combined with one or two refinement sweeps
    recover most of the accuracy lost relative to the reference's f64 MUMPS
    solves at negligible cost (two extra matmuls per sweep)."""
    x = factor.solve(b, trans=trans)
    for _ in range(iters):
        Ax = (A.T @ x) if trans else (A @ x)
        r = b - Ax
        x = x + factor.solve(r, trans=trans)
    return x


def cg_solve(matvec, b, x0=None, M=None, tol: float = 1e-10, maxiter: int = 1000):
    """Preconditioned conjugate gradient (matrix-free fallback for meshes too
    large for dense factorization)."""
    x, _ = jax.scipy.sparse.linalg.cg(
        matvec, b, x0=x0, M=M, tol=tol, maxiter=maxiter
    )
    return x


def eigh_descending(T):
    """Hermitian eigendecomposition sorted by descending eigenvalue (the
    hippylib randomized-eigensolver convention)."""
    d, V = jnp.linalg.eigh(T)
    return d[::-1], V[:, ::-1]


def generalized_eigh(A, B, descending: bool = True):
    """Solve the dense GHEP A v = lambda B v with SPD B via Cholesky
    reduction; eigenvectors are returned B-orthonormal.

    TPU-native equivalent of the SLEPc Krylov-Schur GHEP used for
    prior-orthogonal KLE (`hippyflow/modeling/KLEProjector.py:296-316`)."""
    L, _ = jsl.cho_factor(B, lower=True)
    # S = L^{-1} A L^{-T}
    S = jsl.solve_triangular(L, A, lower=True)
    S = jsl.solve_triangular(L, S.T, lower=True).T
    S = 0.5 * (S + S.T)
    d, Y = jnp.linalg.eigh(S)
    V = jsl.solve_triangular(L, Y, lower=True, trans=1)  # L^{-T} Y
    if descending:
        d, V = d[::-1], V[:, ::-1]
    return d, V
