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

import contextlib
from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .. import config


def _prec_ctx():
    """Matmul-precision context for the banded factorize/solve hot ops.

    `config.set_solver_precision` lowers these ops below the session default
    (e.g. 'high' = 3 bf16 passes instead of 'highest''s 6 on v5e); the lost
    accuracy is recovered by iterative refinement (`RefinedBandFactor`) and,
    for Newton forward solves, by the outer iteration itself.  Default None
    inherits the session precision — CPU tests and f64 parity runs see
    bitwise-identical behavior."""
    p = config.solver_precision()
    return (
        contextlib.nullcontext()
        if p is None
        else jax.default_matmul_precision(p)
    )


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
        with _prec_ctx():
            return self._solve(b, trans)

    def _solve(self, b, trans: bool = False):
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
    with _prec_ctx():
        return _factorize_block_tridiag(D, L_A, B)


def _factorize_block_tridiag(D, L_A, B) -> BlockTridiagFactor:
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


# ---------------------------------------------------------------------------
# Block cyclic reduction
# ---------------------------------------------------------------------------
#
# Block-Thomas is sequential in the nb block rows: its scan issues nb tiny
# batched LU/solve/matmul ops, which measures at <0.1% FLOP utilization on
# TPU — the chip is latency-bound on the 64-step chain.  Cyclic reduction
# restructures the same elimination into ceil(log2(nb)) *levels*; each level
# inverts and multiplies ALL its blocks in one large batched call, so the
# sequential depth drops from nb to log2(nb) while every op is a big batched
# matmul/inverse that keeps the MXU busy.  ~2x the flops of Thomas, an
# order of magnitude less wall-clock at these block counts.
#
# Scheme per level (blocks a_j x_{j-1} + d_j x_j + b_j x_{j+1} = f_j):
# eliminate the odd-indexed unknowns; for even j = 2k the reduced system is
#   a'_k = -alpha_k a_{j-1},   b'_k = -beta_k b_{j+1},
#   d'_k = d_j - alpha_k b_{j-1} - beta_k a_{j+1},
#   f'_k = f_j - alpha_k f_{j-1} - beta_k f_{j+1},
# with alpha_k = a_j inv(d_{j-1}), beta_k = b_j inv(d_{j+1}).
# Back-substitution recovers odd unknowns from even neighbors:
#   x_j = inv(d_j) (f_j - a_j x_{j-1} - b_j x_{j+1}).


def _block_inv(X):
    """Batched small-matrix inverse: Pallas Gauss-Jordan kernel on TPU
    (ops/pallas_kernels.py), jnp.linalg.inv elsewhere."""
    from .pallas_kernels import batched_inverse

    return batched_inverse(X)


class _CRLevel(NamedTuple):
    Dinv_odd: jax.Array  # (n_odd, s, s) inverses of eliminated diagonals
    alpha: jax.Array  # (n_even, s, s)
    beta: jax.Array  # (n_even, s, s)
    a_odd: jax.Array  # (n_odd, s, s) original subdiagonals at odd rows
    b_odd: jax.Array  # (n_odd, s, s) original superdiagonals at odd rows


def _pad_front(x, pad_block):
    return jnp.concatenate([pad_block[None], x], axis=0)


def _pad_back(x, pad_block):
    return jnp.concatenate([x, pad_block[None]], axis=0)


def _cr_reduce(a, d, b):
    """One cyclic-reduction level. Returns (_CRLevel, (a', d', b'))."""
    n, s = d.shape[0], d.shape[1]
    n_even = (n + 1) // 2
    eye = jnp.eye(s, dtype=d.dtype)
    zero = jnp.zeros((s, s), dtype=d.dtype)

    a_odd, d_odd, b_odd = a[1::2], d[1::2], b[1::2]
    Dinv_odd = _block_inv(d_odd)  # one big batched inverse

    # neighbor tables for even rows j = 2k (zero/identity padding encodes
    # the missing j-1 at k=0 and missing j+1 at the last odd-length row;
    # the corresponding a_0 / b_{n-1} are zero, so the pads never leak)
    Dm1 = _pad_front(Dinv_odd, eye)[:n_even]
    Dp1 = _pad_back(Dinv_odd, eye)[:n_even]
    am1 = _pad_front(a_odd, zero)[:n_even]
    bm1 = _pad_front(b_odd, zero)[:n_even]
    ap1 = _pad_back(a_odd, zero)[:n_even]
    bp1 = _pad_back(b_odd, zero)[:n_even]

    a_e, d_e, b_e = a[0::2], d[0::2], b[0::2]
    # Fused-matmul schedule: the textbook form is 6 batched (s,s,s) matmuls
    # (alpha, beta, two for d', a', b').  Batch-stacking the alpha/beta and
    # a'/b' pairs and contraction-merging the two d' products yields 3
    # dispatches, one with contraction depth 2s (>= the 128-lane MXU depth
    # at s=65) — fewer passes over HBM and better systolic-array fill.
    n_e = a_e.shape[0]
    ab = jnp.einsum(
        "kij,kjl->kil",
        jnp.concatenate([a_e, b_e], axis=0),
        jnp.concatenate([Dm1, Dp1], axis=0),
    )  # (2k, s, s) = [alpha; beta]
    alpha, beta = ab[:n_e], ab[n_e:]
    d_new = d_e - jnp.einsum(
        "kij,kjl->kil",
        jnp.concatenate([alpha, beta], axis=2),  # (k, s, 2s)
        jnp.concatenate([bm1, ap1], axis=1),  # (k, 2s, s)
    )
    ab2 = jnp.einsum(
        "kij,kjl->kil", ab, jnp.concatenate([am1, bp1], axis=0)
    )
    a_new, b_new = -ab2[:n_e], -ab2[n_e:]
    level = _CRLevel(
        Dinv_odd=Dinv_odd, alpha=alpha, beta=beta, a_odd=a_odd, b_odd=b_odd
    )
    return level, (a_new, d_new, b_new)


class BlockCyclicFactor(NamedTuple):
    """Cyclic-reduction factorization of a block-tridiagonal matrix.

    ``trans_levels``/``Dinv_root_T`` hold the factorization of A^T (built
    from the transposed band) when adjoint solves are requested."""

    levels: tuple  # of _CRLevel, coarsening by ~2x each entry
    Dinv_root: jax.Array  # (s, s)
    trans_levels: tuple | None
    Dinv_root_T: jax.Array | None

    @property
    def s(self):
        root = self.Dinv_root if self.Dinv_root is not None else self.Dinv_root_T
        return root.shape[-1]

    def solve(self, rhs, trans: bool = False):
        """Solve A x = rhs (or A^T x = rhs). rhs: (n,) or (n, k)."""
        with _prec_ctx():
            return self._solve(rhs, trans)

    def _solve(self, rhs, trans: bool = False):
        levels = self.trans_levels if trans else self.levels
        Dinv_root = self.Dinv_root_T if trans else self.Dinv_root
        assert levels is not None, (
            "this direction was not factorized (with_transpose/with_forward)"
        )
        squeeze = rhs.ndim == 1
        if squeeze:
            rhs = rhs[:, None]
        s = self.s
        f = rhs.reshape(-1, s, rhs.shape[-1])  # (nb, s, k)
        zerov = jnp.zeros((s, f.shape[-1]), dtype=f.dtype)

        # down sweep: reduce rhs level by level
        fs = [f]
        for lv in levels:
            fm1 = _pad_front(f[1::2], zerov)[: lv.alpha.shape[0]]
            fp1 = _pad_back(f[1::2], zerov)[: lv.alpha.shape[0]]
            f = (
                f[0::2]
                - jnp.einsum("kij,kjl->kil", lv.alpha, fm1)
                - jnp.einsum("kij,kjl->kil", lv.beta, fp1)
            )
            fs.append(f)

        # root solve
        x = jnp.einsum("ij,kjl->kil", Dinv_root, f)  # (1, s, k)

        # up sweep: interleave odd unknowns back in
        for lv, f_l in zip(reversed(levels), reversed(fs[:-1])):
            n_even = x.shape[0]
            n_odd = lv.Dinv_odd.shape[0]
            n = n_even + n_odd
            x_p1 = _pad_back(x[1:], zerov) if n_even > 1 else jnp.broadcast_to(
                zerov, (1, s, x.shape[-1])
            )
            x_p1 = x_p1[:n_odd]
            x_m1 = x[:n_odd]
            f_odd = f_l[1::2]
            rhs_odd = (
                f_odd
                - jnp.einsum("kij,kjl->kil", lv.a_odd, x_m1)
                - jnp.einsum("kij,kjl->kil", lv.b_odd, x_p1)
            )
            x_odd = jnp.einsum("kij,kjl->kil", lv.Dinv_odd, rhs_odd)
            merged = jnp.zeros((n, s, x.shape[-1]), dtype=x.dtype)
            merged = merged.at[0::2].set(x)
            merged = merged.at[1::2].set(x_odd)
            x = merged

        out = x.reshape(-1, rhs.shape[-1])
        return out[:, 0] if squeeze else out


def _transpose_band(a, d, b):
    """Band of A^T: (A^T)_{j,j-1} = b_{j-1}^T, diag d_j^T,
    (A^T)_{j,j+1} = a_{j+1}^T."""
    zero = jnp.zeros_like(d[0])
    bT = jnp.swapaxes(b, -1, -2)
    aT = jnp.swapaxes(a, -1, -2)
    a_t = _pad_front(bT[:-1], zero)
    b_t = _pad_back(aT[1:], zero)
    return a_t, jnp.swapaxes(d, -1, -2), b_t


def factorize_block_cyclic(
    D, L_A, B, with_transpose: bool = True, with_forward: bool = True
) -> BlockCyclicFactor:
    """Cyclic-reduction factorization from the three block diagonals.

    with_transpose also factorizes A^T (needed for adjoint/incremental
    solves); Newton forward solves can skip it.  with_forward=False skips
    the A factorization instead — Jacobian materialization solves ONLY
    A^T X = B^T (`models/jacobian.py:54-60`), so building the forward
    sweep there would double the factorization cost for nothing."""
    assert with_transpose or with_forward

    def run(a, d, b):
        levels = []
        while d.shape[0] > 1:
            lv, (a, d, b) = _cr_reduce(a, d, b)
            levels.append(lv)
        return tuple(levels), _block_inv(d)[0]

    levels, Dinv_root = (None, None)
    with _prec_ctx():
        if with_forward:
            levels, Dinv_root = run(L_A, D, B)
        trans_levels, Dinv_root_T = (None, None)
        if with_transpose:
            trans_levels, Dinv_root_T = run(*_transpose_band(L_A, D, B))
    return BlockCyclicFactor(
        levels=levels,
        Dinv_root=Dinv_root,
        trans_levels=trans_levels,
        Dinv_root_T=Dinv_root_T,
    )


def factorize_block_cyclic_banded(
    band, with_transpose: bool = True, with_forward: bool = True
) -> BlockCyclicFactor:
    """Cyclic reduction from (nb, s, 3s) band storage."""
    s = band.shape[1]
    return factorize_block_cyclic(
        band[:, :, s : 2 * s],
        band[:, :, :s],
        band[:, :, 2 * s :],
        with_transpose=with_transpose,
        with_forward=with_forward,
    )


@jax.custom_batching.custom_vmap
def _block_inv_single(X):
    """Inverse of ONE (s, s) block, with a custom vmap rule routing any
    batched call to the Pallas Gauss-Jordan kernel.

    `factorize_thomas_inv_banded` is written per-sample so the public
    solver API composes with jax.vmap; inside its row scan each step
    inverts a single block.  A plain jnp.linalg.inv would batch into
    XLA's sequential-pivoting LU under vmap (measured ~30us per 65x65
    matrix); this rule turns the whole per-step sample batch into one
    blocked Pallas GJ call instead (`ops/pallas_kernels.py`)."""
    return jnp.linalg.inv(X)


@_block_inv_single.def_vmap
def _block_inv_single_vmap_rule(axis_size, in_batched, X):
    del axis_size
    if not in_batched[0]:
        return jnp.linalg.inv(X), False
    return _block_inv(X), True


class InverseThomasFactor(NamedTuple):
    """Block-Thomas factorization carried by EXPLICIT diagonal inverses.

    A = Lhat @ Uhat with Lhat unit-diagonal (subdiagonal multipliers M)
    and Uhat carrying D' on the diagonal (stored as Dinv = D'^{-1}) and
    the original superdiagonal blocks B.  Versus cyclic reduction this
    costs 7 s^3 flops per block row instead of ~16 s^3, runs every scan
    step as ONE batched op over the vmapped sample axis (measured 2.5x
    faster factorization at nx=64 B=256, benchmarks/probe_thomas.py),
    and serves transpose solves from the SAME factors — cyclic reduction
    must factorize the transposed band separately, so `linearize`
    (forward + adjoint solves) saves a full second factorization here.

    Same no-pivoting-between-blocks contract as the other banded
    factorizations (bc-symmetrized FEM operators)."""

    M: jax.Array  # (nb, s, s) subdiagonal multipliers, M[0] = 0
    Dinv: jax.Array  # (nb, s, s) inverses of the pivoted diagonal blocks
    B: jax.Array  # (nb, s, s) superdiagonal blocks of A, B[nb-1] = 0

    @property
    def nb(self):
        return self.M.shape[0]

    @property
    def s(self):
        return self.M.shape[1]

    def solve(self, b, trans: bool = False):
        """Solve A x = b (or A^T x = b). b: (n,) or (n, k)."""
        with _prec_ctx():
            return self._solve(b, trans)

    def _solve(self, b, trans: bool = False):
        squeeze = b.ndim == 1
        if squeeze:
            b = b[:, None]
        nb, s = self.nb, self.s
        bb = b.reshape(nb, s, -1)
        if _pallas_band_solve_wanted(bb.shape[-1], s):
            fn = _thomas_solve_trans_cv if trans else _thomas_solve_fwd_cv
            xs = fn(self.M, self.Dinv, self.B, bb)
        else:
            xs = _thomas_solve_scan(self.M, self.Dinv, self.B, bb, trans)
        x = xs.reshape(nb * s, -1)
        return x[:, 0] if squeeze else x


def _thomas_solve_scan(M, Dinv, B, bb, trans: bool):
    """Reference XLA-scan back-solve through an inverse-Thomas factor.
    M, Dinv, B: (nb, s, s); bb: (nb, s, k) -> (nb, s, k)."""
    if not trans:
        # forward: y_j = b_j - M_j y_{j-1}
        def fwd(y_prev, inputs):
            bj, Mj = inputs
            yj = bj - Mj @ y_prev
            return yj, yj

        y0 = bb[0]
        _, ys_rest = jax.lax.scan(fwd, y0, (bb[1:], M[1:]))
        ys = jnp.concatenate([y0[None], ys_rest], axis=0)

        # backward: x_j = Dinv_j (y_j - B_j x_{j+1})
        def bwd(x_next, inputs):
            yj, Bj, Dij = inputs
            xj = Dij @ (yj - Bj @ x_next)
            return xj, xj

        x_last = Dinv[-1] @ ys[-1]
        _, xs_rest = jax.lax.scan(
            bwd, x_last, (ys[:-1], B[:-1], Dinv[:-1]), reverse=True,
        )
        return jnp.concatenate([xs_rest, x_last[None]], axis=0)
    # A^T = Uhat^T Lhat^T.
    # forward (Uhat^T z = b): z_j = Dinv_j^T (b_j - B_{j-1}^T z_{j-1})
    def fwd_t(z_prev, inputs):
        bj, Bjm1, Dij = inputs
        zj = Dij.T @ (bj - Bjm1.T @ z_prev)
        return zj, zj

    z0 = Dinv[0].T @ bb[0]
    _, zs_rest = jax.lax.scan(fwd_t, z0, (bb[1:], B[:-1], Dinv[1:]))
    zs = jnp.concatenate([z0[None], zs_rest], axis=0)

    # backward (Lhat^T x = z): x_j = z_j - M_{j+1}^T x_{j+1}
    def bwd_t(x_next, inputs):
        zj, Mjp1 = inputs
        xj = zj - Mjp1.T @ x_next
        return xj, xj

    x_last = zs[-1]
    _, xs_rest = jax.lax.scan(bwd_t, x_last, (zs[:-1], M[1:]), reverse=True)
    return jnp.concatenate([xs_rest, x_last[None]], axis=0)


def _pallas_band_solve_wanted(k: int, s: int) -> bool:
    """Trace-time routing decision for `InverseThomasFactor.solve`: the
    fused Pallas sweeps (`ops/pallas_kernels.banded_solve_batch`) replace
    the XLA scan on the TPU backend.  'auto' enables them for multi-rhs
    solves (k >= 8: the dQ-rhs Jacobian/adjoint stages where the scan is
    latency-bound, measured in benchmarks/probe_pallas_band.py); k=1
    Newton back-solves stay on the scan.  Blocks above
    `config.pallas_band_max_block` stay on the scan too — the fused
    kernels' compile cost grows ~linearly in s (see config.py note).
    Program caches key on the mode
    (`models.sampling._PolicyKeyedCache`)."""
    mode = config.pallas_band_solve()
    if mode == "off" or jax.default_backend() != "tpu":
        return False
    if s > config.pallas_band_max_block():
        return False
    return mode == "on" or k >= 8


def _mk_thomas_solve_cv(trans: bool):
    """custom_vmap wrapper: unbatched calls take the scan; a sample-batched
    call (the vmapped materialize/adjoint stages) dispatches ONE fused
    Pallas solve over the whole batch."""

    @jax.custom_batching.custom_vmap
    def solve_cv(M, Dinv, B, bb):
        return _thomas_solve_scan(M, Dinv, B, bb, trans)

    @solve_cv.def_vmap
    def _rule(axis_size, in_batched, M, Dinv, B, bb):
        args = []
        for a, batched in zip((M, Dinv, B, bb), in_batched):
            args.append(
                a
                if batched
                else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            )
        M_b, Dinv_b, B_b, bb_b = args
        if (
            M_b.ndim == 4
            and jax.default_backend() == "tpu"
            and M_b.shape[-1] <= config.pallas_band_max_block()
        ):
            from .pallas_kernels import banded_solve_batch

            return banded_solve_batch(M_b, Dinv_b, B_b, bb_b, trans), True
        # nested vmap or non-TPU: plain batched scan
        return jax.vmap(
            lambda m_, d_, b2_, r_: _thomas_solve_scan(m_, d_, b2_, r_, trans)
        )(M_b, Dinv_b, B_b, bb_b), True

    return solve_cv


_thomas_solve_fwd_cv = _mk_thomas_solve_cv(False)
_thomas_solve_trans_cv = _mk_thomas_solve_cv(True)


@jax.custom_batching.custom_vmap
def _thomas_factorize_cv(band):
    return _factorize_thomas_inv_banded(band)


@_thomas_factorize_cv.def_vmap
def _thomas_factorize_rule(axis_size, in_batched, band):
    if not in_batched[0]:
        band = jnp.broadcast_to(band[None], (axis_size,) + band.shape)
    batched_spec = InverseThomasFactor(M=True, Dinv=True, B=True)
    if (
        band.ndim == 4
        and jax.default_backend() == "tpu"
        and band.shape[2] <= config.pallas_band_max_block()
    ):
        from .pallas_kernels import banded_factorize_batch

        M, Dinv = banded_factorize_batch(band)
        s = band.shape[2]
        return (
            InverseThomasFactor(M=M, Dinv=Dinv, B=band[..., 2 * s :]),
            batched_spec,
        )
    out = jax.vmap(_factorize_thomas_inv_banded)(band)
    return out, batched_spec


def factorize_thomas_inv_banded(band) -> InverseThomasFactor:
    """Inverse-based block-Thomas factorization from (nb, s, 3s) band
    storage.  Per-sample function; compose with jax.vmap for batches.

    On the TPU backend a sample-batched call (the vmapped Newton /
    linearize paths) dispatches ONE fused Pallas factorization
    (`ops/pallas_kernels.banded_factorize_batch`: grid over block rows,
    Dinv carry VMEM-resident, in-kernel blocked Gauss-Jordan) — measured
    at nx=192 the XLA scan's per-row dispatches put factorization at 76%
    of the Jacobian stage (benchmarks/probe_jac_stages.py).  Elsewhere the
    scan runs, with every step's matmuls and inverse batched over the
    vmapped sample axis (see `_block_inv_single`).  Routing obeys
    `config.set_pallas_band_solve` ('off' keeps the scan everywhere)."""
    with _prec_ctx():
        if config.pallas_band_solve() != "off" and (
            jax.default_backend() == "tpu"
        ):
            return _thomas_factorize_cv(band)
        return _factorize_thomas_inv_banded(band)


def _factorize_thomas_inv_banded(band) -> InverseThomasFactor:
    s = band.shape[1]
    A = band[:, :, :s]
    D = band[:, :, s : 2 * s]
    Bb = band[:, :, 2 * s :]

    Dinv0 = _block_inv_single(D[0])

    def step(Dinv_prev, inputs):
        Dj, Aj, Bjm1 = inputs
        Mj = Aj @ Dinv_prev
        Dinv = _block_inv_single(Dj - Mj @ Bjm1)
        return Dinv, (Mj, Dinv)

    _, (Ms, Dinvs) = jax.lax.scan(step, Dinv0, (D[1:], A[1:], Bb[:-1]))
    Ms = jnp.concatenate([jnp.zeros_like(Dinv0)[None], Ms], axis=0)
    Dinvs = jnp.concatenate([Dinv0[None], Dinvs], axis=0)
    return InverseThomasFactor(M=Ms, Dinv=Dinvs, B=Bb)


def thomas_inv_flops(nb: int, s: int, n_rhs: int = 1) -> float:
    """Analytic FLOP count of one `factorize_thomas_inv_banded` +
    `InverseThomasFactor.solve` call (per sample).

    Needed because XLA's HLO cost analysis counts a while/scan body ONCE —
    the length-nb scans here make `flops_of` undercount by ~nb.  Model:
    factorization 7 s^3 per block row (Gauss-Jordan inverse ~3 s^3 +
    two s x s matmuls 2 s^3 each), solve 6 s^2 per row per rhs (one
    matmul in the forward sweep, two in the back-substitution)."""
    return float(nb) * (7.0 * s**3 + 6.0 * s**2 * n_rhs)


def thomas_inv_bytes(
    nb: int, s: int, n_rhs: int = 1, itemsize: int = 4
) -> float:
    """Analytic HBM-traffic model (bytes per sample) of one assembly +
    `factorize_thomas_inv_banded` + `InverseThomasFactor.solve` pass —
    the honest numerator for a bandwidth utilization (XLA's "bytes
    accessed" over-counts fused/cached traffic and can exceed the physical
    peak; see `utils.profiling.bytes_of`).

    Model (each block row holds three s x s blocks = 3 s^2 elements):
    assembly writes the band once; factorization reads the band and
    writes the same-footprint inverse-diagonal factor; the solve streams
    the factor once and the rhs block vector three times (read b, carry,
    write x).  Lower bound: assumes every buffer moves through HBM exactly
    as often as the dataflow requires, no re-fetches."""
    band = 3.0 * nb * s * s * itemsize
    rhs = nb * s * n_rhs * itemsize
    return 4.0 * band + 3.0 * rhs


def block_tridiag_matmat(band, X):
    """A @ X for band storage (nb, s, 3s); X: (n,) or (n, k).

    The O(n s) matvec that replaces dense prior-operator matmuls on large
    structured meshes."""
    squeeze = X.ndim == 1
    if squeeze:
        X = X[:, None]
    nb, s = band.shape[0], band.shape[1]
    xb = X.reshape(nb, s, -1)
    L_A = band[:, :, :s]
    D = band[:, :, s : 2 * s]
    B = band[:, :, 2 * s :]
    y = jnp.einsum("kij,kjl->kil", D, xb)
    y = y.at[1:].add(jnp.einsum("kij,kjl->kil", L_A[1:], xb[:-1]))
    y = y.at[:-1].add(jnp.einsum("kij,kjl->kil", B[:-1], xb[1:]))
    out = y.reshape(nb * s, -1)
    return out[:, 0] if squeeze else out


def block_tridiag_matmat_trans(band, X):
    """A^T @ X for band storage (nb, s, 3s); X: (n,) or (n, k).

    (A^T)_{j,j-1} = B_{j-1}^T, diagonal D_j^T, (A^T)_{j,j+1} = A_{j+1}^T —
    computed directly from the untransposed band (einsum index swap), no
    transposed copies materialized."""
    squeeze = X.ndim == 1
    if squeeze:
        X = X[:, None]
    nb, s = band.shape[0], band.shape[1]
    xb = X.reshape(nb, s, -1)
    L_A = band[:, :, :s]
    D = band[:, :, s : 2 * s]
    B = band[:, :, 2 * s :]
    y = jnp.einsum("kji,kjl->kil", D, xb)
    y = y.at[1:].add(jnp.einsum("kji,kjl->kil", B[:-1], xb[:-1]))
    y = y.at[:-1].add(jnp.einsum("kji,kjl->kil", L_A[1:], xb[1:]))
    out = y.reshape(nb * s, -1)
    return out[:, 0] if squeeze else out


@jax.tree_util.register_pytree_node_class
class RefinedBandFactor:
    """Iterative refinement around a (possibly low-precision) banded factor.

    Mixed-precision scheme (VERDICT r4 item 1): the inner factorization and
    its back-solves may run with lowered matmul precision
    (`config.set_solver_precision`); each refinement sweep computes the
    residual r = b - A x with the banded matvec at 'highest' precision and
    re-solves for the correction.  The refined solution's accuracy is set by
    the residual evaluation, not the factor — standard iterative-refinement
    backward stability (one sweep recovers ~3 decimal digits per sweep at
    these condition numbers; measured in benchmarks/probe_precision.py).

    Pytree: (inner, band) are leaves (vmap/jit batch them together); the
    sweep count is static aux data."""

    def __init__(self, inner, band, n_refine: int = 1):
        self.inner = inner
        self.band = band
        self.n_refine = n_refine

    def tree_flatten(self):
        return (self.inner, self.band), (self.n_refine,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    def solve(self, b, trans: bool = False):
        x = self.inner.solve(b, trans=trans)
        matmat = block_tridiag_matmat_trans if trans else block_tridiag_matmat
        for _ in range(self.n_refine):
            with jax.default_matmul_precision("highest"):
                r = b - matmat(self.band, x)
            x = x + self.inner.solve(r, trans=trans)
        return x


@jax.tree_util.register_pytree_node_class
class PermutedFactor:
    """Factorization of P A P^T exposed in the ORIGINAL dof order.

    Wraps any banded factor (BlockCyclicFactor, BlockTridiagFactor,
    DistributedBandedFactor) built from a `fem.band_order.BandOrder`-permuted
    band: ``solve`` gathers the rhs into band order, solves, and gathers
    back — one O(n) gather each way around the O(n s^2) band solve.
    The (static) ordering lives in aux data so vmap/jit batch only the
    inner factor's leaves."""

    def __init__(self, inner, border):
        self.inner = inner
        self.border = border  # BandOrder (static)

    def tree_flatten(self):
        return (self.inner,), (self.border,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    def solve(self, b, trans: bool = False):
        bo = self.border
        squeeze = b.ndim == 1
        if squeeze:
            b = b[:, None]
        order = jnp.asarray(bo.order)
        pad = jnp.zeros((bo.n_pad, b.shape[1]), dtype=b.dtype)
        y = jnp.concatenate([b[order], pad], axis=0)
        x = self.inner.solve(y, trans=trans)
        out = x[jnp.asarray(bo.inv)]
        return out[:, 0] if squeeze else out


class BlockBidiagCholesky(NamedTuple):
    """Block-bidiagonal Cholesky factor L of an SPD block-tridiagonal matrix
    (M = L L^T): diagonal blocks C (lower-triangular), subdiagonal blocks
    Off.  Because Cholesky preserves the band, this IS the dense Cholesky
    factor of M — sqrt-mass sampling through it matches the dense prior."""

    C: jax.Array  # (nb, s, s) lower-triangular diagonal blocks
    Off: jax.Array  # (nb, s, s) subdiagonal blocks (Off[0] = 0)

    def matvec_L(self, X):
        """L @ X; X: (n,) or (n, k)."""
        squeeze = X.ndim == 1
        if squeeze:
            X = X[:, None]
        nb, s = self.C.shape[0], self.C.shape[1]
        xb = X.reshape(nb, s, -1)
        y = jnp.einsum("kij,kjl->kil", jnp.tril(self.C), xb)
        y = y.at[1:].add(jnp.einsum("kij,kjl->kil", self.Off[1:], xb[:-1]))
        out = y.reshape(nb * s, -1)
        return out[:, 0] if squeeze else out


def block_cholesky_tridiag(band) -> BlockBidiagCholesky:
    """Block Cholesky of an SPD matrix in (nb, s, 3s) band storage.

    Recurrence: Off_j = A_j C_{j-1}^{-T},  C_j = chol(D_j - Off_j Off_j^T)."""
    s = band.shape[1]
    L_A = band[:, :, :s]
    D = band[:, :, s : 2 * s]

    def step(C_prev, inputs):
        Dj, Aj = inputs
        Off = jsl.solve_triangular(C_prev, Aj.T, lower=True).T  # A C^{-T}
        Cj = jnp.linalg.cholesky(Dj - Off @ Off.T)
        return Cj, (Cj, Off)

    C0 = jnp.linalg.cholesky(D[0])
    _, (Cs, Offs) = jax.lax.scan(step, C0, (D[1:], L_A[1:]))
    C_all = jnp.concatenate([C0[None], Cs], axis=0)
    Off_all = jnp.concatenate([jnp.zeros_like(C0)[None], Offs], axis=0)
    return BlockBidiagCholesky(C=C_all, Off=Off_all)
