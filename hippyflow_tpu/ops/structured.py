"""Block-tridiagonal direct solver for structured-mesh FEM operators.

On a structured rectangle mesh with row-major dof numbering (fem/mesh.py),
any P1 operator couples a node only to the previous/current/next grid row, so
the matrix is block-tridiagonal with square blocks of size s = nx + 1 and
nb = ny + 1 block rows.  Block-Thomas (block LU without inter-block
pivoting) factorizes it in O(nb * s^3) flops instead of the O((nb*s)^3) of a
dense LU — a ~(nb)^2-fold flop reduction (4096x at a 64x64 mesh) — and each
back-solve is O(nb * s^2) per right-hand side.

This is the TPU-native replacement for the reference's sparse MUMPS LU
(`hp.PETScLUSolver`, SURVEY.md section 2.5): every step is a small dense
LU/triangular-solve/matmul batched over samples with vmap, so the MXU stays
busy while the sequential depth is only nb.

Factorization:  A = Lhat @ Uhat with
    Lhat = block lower-bidiagonal, identity diagonal, subdiagonal L_j
    Uhat = block upper-bidiagonal, diagonal D'_j (LU-factorized), super B_j
Recurrence:  D'_0 = D_0;  L_j = A_j D'_{j-1}^{-1};  D'_j = D_j - L_j B_{j-1}.
Transpose solves reuse the same factors (Uhat^T forward sweep, Lhat^T
backward sweep), giving the incremental adjoint solves for free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


class BlockTridiagFactor(NamedTuple):
    """Block-Thomas factorization of a block-tridiagonal matrix."""

    Dlu: jax.Array  # (nb, s, s) LU factors of the pivoted diagonal blocks
    Dpiv: jax.Array  # (nb, s) pivots
    L: jax.Array  # (nb, s, s) subdiagonal multipliers (L[0] = 0)
    B: jax.Array  # (nb, s, s) superdiagonal blocks of A (B[nb-1] = 0)

    @property
    def nb(self):
        return self.Dlu.shape[0]

    @property
    def s(self):
        return self.Dlu.shape[1]

    def solve(self, b, trans: bool = False):
        """Solve A x = b (or A^T x = b). b: (n,) or (n, k)."""
        squeeze = b.ndim == 1
        if squeeze:
            b = b[:, None]
        nb, s = self.nb, self.s
        bb = b.reshape(nb, s, -1)

        if not trans:
            # forward: y_j = b_j - L_j y_{j-1}
            def fwd(y_prev, inputs):
                bj, Lj = inputs
                yj = bj - Lj @ y_prev
                return yj, yj

            y0 = bb[0]
            _, ys_rest = jax.lax.scan(fwd, y0, (bb[1:], self.L[1:]))
            ys = jnp.concatenate([y0[None], ys_rest], axis=0)

            # backward: x_j = D'_j^{-1} (y_j - B_j x_{j+1})
            def bwd(x_next, inputs):
                yj, Bj, Dlu_j, piv_j = inputs
                xj = jsl.lu_solve((Dlu_j, piv_j), yj - Bj @ x_next)
                return xj, xj

            x_last = jsl.lu_solve((self.Dlu[-1], self.Dpiv[-1]), ys[-1])
            _, xs_rest = jax.lax.scan(
                bwd,
                x_last,
                (ys[:-1], self.B[:-1], self.Dlu[:-1], self.Dpiv[:-1]),
                reverse=True,
            )
            xs = jnp.concatenate([xs_rest, x_last[None]], axis=0)
        else:
            # A^T = Uhat^T Lhat^T.
            # forward (Uhat^T z = b): z_j = D'_j^{-T} (b_j - B_{j-1}^T z_{j-1})
            def fwd_t(z_prev, inputs):
                bj, Bjm1, Dlu_j, piv_j = inputs
                zj = jsl.lu_solve((Dlu_j, piv_j), bj - Bjm1.T @ z_prev, trans=1)
                return zj, zj

            z0 = jsl.lu_solve((self.Dlu[0], self.Dpiv[0]), bb[0], trans=1)
            _, zs_rest = jax.lax.scan(
                fwd_t, z0, (bb[1:], self.B[:-1], self.Dlu[1:], self.Dpiv[1:])
            )
            zs = jnp.concatenate([z0[None], zs_rest], axis=0)

            # backward (Lhat^T x = z): x_j = z_j - L_{j+1}^T x_{j+1}
            def bwd_t(x_next, inputs):
                zj, Ljp1 = inputs
                xj = zj - Ljp1.T @ x_next
                return xj, xj

            x_last = zs[-1]
            _, xs_rest = jax.lax.scan(
                bwd_t, x_last, (zs[:-1], self.L[1:]), reverse=True
            )
            xs = jnp.concatenate([xs_rest, x_last[None]], axis=0)

        x = xs.reshape(nb * s, -1)
        return x[:, 0] if squeeze else x


def extract_block_tridiag(A, s: int):
    """Extract (D (nb,s,s), L_A (nb,s,s), B (nb,s,s)) from a dense
    block-tridiagonal matrix. L_A[0] = B[nb-1] = 0."""
    n = A.shape[0]
    nb = n // s
    assert nb * s == n
    Ab = A.reshape(nb, s, nb, s)
    idx = jnp.arange(nb)
    D = Ab[idx, :, idx, :]
    L_A = jnp.zeros((nb, s, s), dtype=A.dtype)
    L_A = L_A.at[1:].set(Ab[idx[1:], :, idx[:-1], :])
    B = jnp.zeros((nb, s, s), dtype=A.dtype)
    B = B.at[:-1].set(Ab[idx[:-1], :, idx[1:], :])
    return D, L_A, B


def factorize_block_tridiag(D, L_A, B) -> BlockTridiagFactor:
    """Block-Thomas factorization from the three block diagonals."""

    def step(Dp_prev, inputs):
        Dj, Aj, Bjm1 = inputs
        # L_j = A_j @ inv(D'_{j-1}) via solving D'^T X^T = A^T
        lu, piv = jsl.lu_factor(Dp_prev)
        Lj = jsl.lu_solve((lu, piv), Aj.T, trans=1).T
        Dp = Dj - Lj @ Bjm1
        return Dp, (Dp, Lj)

    Dp0 = D[0]
    _, (Dps, Ls) = jax.lax.scan(step, Dp0, (D[1:], L_A[1:], B[:-1]))
    Dp_all = jnp.concatenate([Dp0[None], Dps], axis=0)
    L_all = jnp.concatenate([jnp.zeros_like(Dp0)[None], Ls], axis=0)
    Dlu, Dpiv = jax.vmap(jsl.lu_factor)(Dp_all)
    return BlockTridiagFactor(Dlu=Dlu, Dpiv=Dpiv, L=L_all, B=B)


def factorize_block_tridiag_dense(A, s: int) -> BlockTridiagFactor:
    """Factorize a dense block-tridiagonal matrix with block size s."""
    D, L_A, B = extract_block_tridiag(A, s)
    return factorize_block_tridiag(D, L_A, B)


def factorize_block_tridiag_banded(band) -> BlockTridiagFactor:
    """Factorize from (nb, s, 3s) band storage (fem.assemble_A_banded):
    columns [0, s) are the subdiagonal blocks, [s, 2s) the diagonal,
    [2s, 3s) the superdiagonal.  Skips the dense matrix entirely — assembly,
    factorization and solves all stay O(n s) in memory."""
    s = band.shape[1]
    L_A = band[:, :, :s]
    D = band[:, :, s : 2 * s]
    B = band[:, :, 2 * s :]
    return factorize_block_tridiag(D, L_A, B)
