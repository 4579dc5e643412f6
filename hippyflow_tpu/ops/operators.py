"""Linear-operator combinators on dense blocks.

The reference implements a zoo of duck-typed ``mult/transpmult`` operators
(`hippyflow/modeling/lowRankRectangularOperator.py`,
`priorPreconditionedProjector.py`, `operatorWrappers.py`).  Here an operator
is simply a callable ``matmat(X: (n, k)) -> (m, k)``; these helpers build the
same algebraic objects as closures over jnp arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def dense_operator(A):
    """Operator from a dense matrix (reference: npToDolfinOperator,
    `operatorWrappers.py:19-52`)."""
    return lambda X: A @ X


def low_rank_operator(d, U):
    """U diag(d) U^T action (reference: hp.LowRankOperator, used for the POD
    sample covariance `PODProjector.py:360`)."""
    return lambda X: U @ (d[:, None] * (U.T @ X))


def low_rank_rectangular_operator(U, s, V):
    """U diag(s) V^T action and its transpose (reference:
    `lowRankRectangularOperator.py:17-65`). Returns (matmat, rmatmat)."""
    mat = lambda X: U @ (s[:, None] * (V.T @ X))
    rmat = lambda X: V @ (s[:, None] * (U.T @ X))
    return mat, rmat


def prior_preconditioned_projector(U, Cinv_matmat):
    """Oblique projector  P = U U^T C^{-1}  onto span(U) along the C-inner
    product (reference: `priorPreconditionedProjector.py:48-55`; used in the
    AS/KLE projection error tests)."""
    return lambda X: U @ (U.T @ Cinv_matmat(X))


def mean_jtj_from_data_operator(J_data, noise_precision=None):
    """Monte-Carlo mean of J^T Sigma^{-1} J from stored per-sample dense
    Jacobians J_data (n_samples, dq, dm) (reference: MeanJTJfromDataOperator,
    `operatorWrappers.py:55-121`)."""
    J = jnp.asarray(J_data)

    def matmat(X):
        JX = jnp.einsum("sqm,mk->sqk", J, X)
        if noise_precision is not None:
            JX = jnp.einsum("qp,spk->sqk", noise_precision, JX)
        return jnp.einsum("sqm,sqk->mk", J, JX) / J.shape[0]

    return matmat


def solver_to_operator(solve):
    """Present a solver (a factor's ``solve`` or any callable mapping rhs
    blocks to solutions) as a plain matmat operator — the reference's
    hp.Solver2Operator (`hippyflow/modeling/KLEProjector.py:103`)."""
    return lambda X: solve(X)


def transpose_operator(A):
    """Operator applying A^T (reference: hp.Transpose).  Accepts a dense
    matrix or a (matmat, rmatmat) pair from low_rank_rectangular_operator."""
    if isinstance(A, tuple):
        return A[1]
    return lambda X: jnp.asarray(A).T @ X


def averaged_operator(matmats, average: bool = True):
    """Sum/average of a list of operators (reference: SummedListOperator,
    `activeSubspaceProjector.py:69-95`)."""

    def matmat(X):
        Y = None
        for op in matmats:
            Yi = op(X)
            Y = Yi if Y is None else Y + Yi
        return Y / len(matmats) if average else Y

    return matmat
