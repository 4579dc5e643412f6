"""Pallas TPU kernels for the structured-solver hot ops.

``batched_inverse`` is the innermost operation of the cyclic-reduction
factorization (`ops/structured.py`): every reduction level inverts a large
batch of small (block) matrices.  XLA's LU-based ``jnp.linalg.inv`` issues a
sequential pivoting loop per matrix and measures ~30us per 65x65 inverse on
v5e (<0.1% utilization).  This kernel runs Gauss-Jordan elimination *without
pivoting* on a VMEM-resident tile of matrices: the s-step elimination loop
lives inside one kernel, each step is a rank-1 update over the whole tile
(pure VPU work), and there is no per-step dispatch or HBM traffic.

No pivoting is safe here: cyclic reduction feeds it the (shifted) diagonal
blocks of assembled second-order FEM operators with Dirichlet rows
symmetrized to the identity — strongly diagonally dominant.  Callers that
cannot guarantee this should use ``jnp.linalg.inv``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _gj_kernel(a_ref, out_ref):
    """Gauss-Jordan on the augmented matrix [A | I] held in a VMEM scratch
    ref: per elimination step, one dynamic row read (pl.ds on the sublane
    dim), a masked lane-reduce for the pivot column, a single rank-1 fma
    over the (tb, s, 2s) tile, and one dynamic row write."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    A = a_ref[...]  # (tb, s, s)
    tb, s = A.shape[0], A.shape[-1]

    def body(aug_ref):
        aug_ref[:, :, :s] = A
        aug_ref[:, :, s:] = jnp.broadcast_to(jnp.eye(s, dtype=A.dtype), A.shape)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * s), 2)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, s, 1), 1)

        def step(k, _):
            rowk = aug_ref[:, pl.ds(k, 1), :]  # (tb, 1, 2s)
            pivot = jnp.sum(
                jnp.where(lane_ids == k, rowk, 0.0), axis=2, keepdims=True
            )  # (tb, 1, 1)
            rowk_n = rowk / pivot
            AUG = aug_ref[...]
            colk = jnp.sum(
                jnp.where(lane_ids == k, AUG, 0.0), axis=2, keepdims=True
            )  # (tb, s, 1)
            colk = jnp.where(row_ids == k, 0.0, colk)
            aug_ref[...] = AUG - colk * rowk_n  # rank-1 fma over the tile
            aug_ref[:, pl.ds(k, 1), :] = rowk_n
            return 0

        jax.lax.fori_loop(0, s, step, 0)
        out_ref[...] = aug_ref[:, :, s:]

    pl.run_scoped(body, pltpu.VMEM((tb, s, 2 * s), A.dtype))


@functools.partial(jax.jit, static_argnames=("tile",))
def _batched_inverse_pallas(X, tile: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, s, _ = X.shape
    n_pad = (-N) % tile
    if n_pad:
        eye = jnp.broadcast_to(jnp.eye(s, dtype=X.dtype), (n_pad, s, s))
        X = jnp.concatenate([X, eye], axis=0)
    grid = (X.shape[0] // tile,)
    out = pl.pallas_call(
        _gj_kernel,
        out_shape=jax.ShapeDtypeStruct(X.shape, X.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, s, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (tile, s, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * X.shape[0] * s**3),
            bytes_accessed=int(2 * X.size * X.dtype.itemsize),
            transcendentals=0,
        ),
    )(X)
    return out[:N] if n_pad else out


def _auto_tile(s: int, itemsize: int) -> int:
    """Largest power-of-two tile fitting the kernel's live set in VMEM.
    Mosaic pads (s, s) to (ceil8(s), 128) lanes for f32; the kernel keeps
    ~8 tile-sized buffers alive (in/out blocks, two loop carries, update
    temporaries), so budget 12MB / 8 buffers."""
    sub = -(-s // 8) * 8
    lane = max(128, -(-s // 128) * 128)
    per_matrix = 8 * sub * lane * itemsize
    t = max(1, int(12e6 / per_matrix))
    return 1 << (t.bit_length() - 1)


def batched_inverse(X, force: str | None = None):
    """Inverses of a batch of small square matrices: (N, s, s) -> (N, s, s).

    On TPU uses the BLOCKED Pallas Gauss-Jordan kernel (rank-13 MXU updates;
    no pivoting — see module docstring).  Chain-timed on v5e at
    (8192, 65, 65) f32: blocked 15.1 ms vs rank-1 761.7 ms vs XLA LU
    183.9 ms (benchmarks/probe_cr.py; the earlier 48 ms rank-1 figure was a
    memoized-dispatch artifact).  Elsewhere (or with force='xla') falls back
    to ``jnp.linalg.inv``.  force='pallas'/'pallas_rank1' run the kernels in
    interpret mode on non-TPU backends (tests)."""
    X = jnp.asarray(X)
    N, s, s2 = X.shape
    assert s == s2, "square matrices required"
    backend = jax.default_backend()
    use_pallas = force in ("pallas", "pallas_rank1") or (
        force is None and backend == "tpu" and s <= 256
    )
    # s > 256 (helmholtz ordered bands, s=516): the VMEM scratch no longer
    # fits once an outer vmap batches the kernel block (measured 32.6MB
    # scoped vs the 16MB limit at s=516, batch 8) — XLA's LU inverse wins
    # by default there.
    if not use_pallas:
        return jnp.linalg.inv(X)
    # cap the tile at the (pow2-padded) batch so deep cyclic-reduction
    # levels (N = 16, 8, ... 1) don't pad to a full 32-wide tile
    tile = min(_auto_tile(s, X.dtype.itemsize), 1 << max(N - 1, 0).bit_length())
    if backend != "tpu":  # interpret-mode path for tests
        from jax.experimental import pallas as pl

        tile = min(8, N)
        n_pad = (-N) % tile
        if n_pad:
            eye = jnp.broadcast_to(jnp.eye(s, dtype=X.dtype), (n_pad, s, s))
            X = jnp.concatenate([X, eye], axis=0)
        kernel = (
            _gj_kernel if force == "pallas_rank1"
            else _gj_blocked_kernel_factory(13)
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(X.shape, X.dtype),
            grid=(X.shape[0] // tile,),
            in_specs=[pl.BlockSpec((tile, s, s), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((tile, s, s), lambda i: (i, 0, 0)),
            interpret=True,
        )(X)
        return out[: N]
    if force == "pallas_rank1":
        return _batched_inverse_pallas(X, tile)
    return _batched_inverse_blocked(X, tile, 13)


# ---------------------------------------------------------------------------
# Fused banded back-solve (VERDICT r4 item 4)
# ---------------------------------------------------------------------------
#
# `InverseThomasFactor.solve` as an XLA scan issues 2*nb tiny dispatches per
# solve, each round-tripping the (batch, s, k) carry through HBM — measured
# latency-bound at <1% FLOP utilization on the Jacobian stage's dQ-rhs
# trans-solves.  These kernels run one whole sweep per `pallas_call`: the
# carry lives in a VMEM scratch that persists across the grid's block-row
# steps, factor blocks stream through double-buffered BlockSpec DMA, and the
# only HBM traffic is one read of the factor + one read/write of the rhs per
# sweep — the roofline of the recurrence.
#
# Sweep algebra (see `ops/structured.InverseThomasFactor._solve`): every
# sweep is  out_j = G_j (b_j - H_j^{(T)} @ carry);  carry = out_j  with
#   fwd    :  H = M_j          (no G)                 rows ascend
#   bwd    :  H = B_j,         G = Dinv_j             rows descend
#   fwd_t  :  H = B_{j-1}^T,   G = Dinv_j^T           rows ascend
#   bwd_t  :  H = M_{j+1}^T    (no G)                 rows descend
# M[0] = 0 and B[nb-1] = 0 in the factor, and the carry is zeroed at each
# sweep's first step, so clamped neighbor indices never leak garbage.


def _sweep_kernel_factory(has_G: bool, trans_H: bool, trans_G: bool):
    import jax.experimental.pallas as pl

    def bdot(A, x, transpose):
        # contract A's row (transpose) or column (plain) index with x's
        # block-row index; f32 accumulation, precision pinned HIGHEST so an
        # ambient solver-precision context cannot leak into the kernel
        # trace (Mosaic lowers only DEFAULT/HIGHEST).
        dims = (((1,) if transpose else (2,), (1,)), ((0,), (0,)))
        return jax.lax.dot_general(
            A, x, dimension_numbers=dims,
            preferred_element_type=x.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )

    if has_G:

        def kernel(H_ref, G_ref, b_ref, out_ref, carry):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                carry[...] = jnp.zeros_like(carry)

            t = b_ref[:, 0] - bdot(H_ref[:, 0], carry[...], trans_H)
            t = bdot(G_ref[:, 0], t, trans_G)
            out_ref[:, 0] = t
            carry[...] = t

    else:

        def kernel(H_ref, b_ref, out_ref, carry):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                carry[...] = jnp.zeros_like(carry)

            t = b_ref[:, 0] - bdot(H_ref[:, 0], carry[...], trans_H)
            out_ref[:, 0] = t
            carry[...] = t

    return kernel


def _band_solve_tile(s: int, k: int, itemsize: int) -> int:
    """Largest power-of-two sample tile fitting a sweep's live set in VMEM:
    two double-buffered (s, s) factor blocks, double-buffered (s, k) rhs-in
    and out blocks, one (s, k) carry — Mosaic-padded to (8, 128) f32 tiles.
    Budget 28 MB (v5e VMEM is 128 MB; leave room for Mosaic temporaries and
    the second sweep's pipeline)."""
    sub = -(-s // 8) * 8
    lf = -(-s // 128) * 128
    lk = -(-k // 128) * 128
    per = itemsize * (2 * 2 * sub * lf + 5 * sub * lk)
    t = max(1, int(28e6 / per))
    return 1 << (t.bit_length() - 1)


def _run_sweep(H, G, bb, *, trans_H, trans_G, reverse, h_shift, tile,
               interpret=False):
    """One recurrence sweep over nb block rows.  H, G: (N, nb, s, s) factor
    diagonals; bb: (N, nb, s, k).  h_shift in {-1, 0, +1} selects the
    neighbor row H is read from (clamped; safe by the zero-carry/zero-block
    convention above)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, nb, s, _ = H.shape
    k = bb.shape[-1]

    def row(j):
        return (nb - 1 - j) if reverse else j

    def h_row(j):
        r = row(j) + h_shift
        if h_shift < 0:
            return jnp.maximum(r, 0)
        if h_shift > 0:
            return jnp.minimum(r, nb - 1)
        return r

    fac_spec = lambda idx: pl.BlockSpec(
        (tile, 1, s, s), lambda i, j, idx=idx: (i, idx(j), 0, 0),
        memory_space=pltpu.VMEM,
    )
    rhs_spec = pl.BlockSpec(
        (tile, 1, s, k), lambda i, j: (i, row(j), 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [fac_spec(h_row)]
    args = [H]
    if G is not None:
        in_specs.append(fac_spec(row))
        args.append(G)
    in_specs.append(rhs_spec)
    args.append(bb)
    kernel = _sweep_kernel_factory(G is not None, trans_H, trans_G)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(bb.shape, bb.dtype),
        grid=(N // tile, nb),
        in_specs=in_specs,
        out_specs=rhs_spec,
        scratch_shapes=[pltpu.VMEM((tile, s, k), bb.dtype)],
        # the default scoped-vmem limit is 16 MB; the tile sizing targets
        # ~28 MB of live buffers (double-buffered factor/rhs blocks +
        # carry), well under the 128 MB physical VMEM — raise the cap with
        # headroom for Mosaic temporaries
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * (2 if G is not None else 1) * N * nb * s * s * k),
            bytes_accessed=int(
                (2 if G is not None else 1) * H.size * H.dtype.itemsize
                + 2 * bb.size * bb.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("trans", "interpret"))
def banded_solve_batch(M, Dinv, B, bb, trans: bool, interpret: bool = False):
    """Batched block-Thomas back-solve through explicit diagonal inverses
    (`ops/structured.InverseThomasFactor`), two fused Pallas sweeps.

    M, Dinv, B: (N, nb, s, s); bb: (N, nb, s, k).  Returns x with
    A x = b (trans=False) or A^T x = b (trans=True), matching the XLA-scan
    reference implementation to roundoff (same operation order per step).
    """
    N, nb, s, _ = M.shape
    k = bb.shape[-1]
    tile = min(
        _band_solve_tile(s, k, bb.dtype.itemsize),
        1 << max(N - 1, 0).bit_length(),
    )
    if interpret:
        tile = min(tile, 4)
    n_pad = (-N) % tile
    if n_pad:
        eye = jnp.broadcast_to(jnp.eye(s, dtype=M.dtype), (n_pad, nb, s, s))
        zero = jnp.zeros((n_pad, nb, s, s), dtype=M.dtype)
        M = jnp.concatenate([M, zero], axis=0)
        Dinv = jnp.concatenate([Dinv, eye], axis=0)
        B = jnp.concatenate([B, zero], axis=0)
        bb = jnp.concatenate(
            [bb, jnp.zeros((n_pad, nb, s, k), dtype=bb.dtype)], axis=0
        )
    kw = dict(tile=tile, interpret=interpret)
    if not trans:
        # fwd:  y_j = b_j - M_j y_{j-1}
        y = _run_sweep(M, None, bb, trans_H=False, trans_G=False,
                       reverse=False, h_shift=0, **kw)
        # bwd:  x_j = Dinv_j (y_j - B_j x_{j+1})
        x = _run_sweep(B, Dinv, y, trans_H=False, trans_G=False,
                       reverse=True, h_shift=0, **kw)
    else:
        # fwd_t:  z_j = Dinv_j^T (b_j - B_{j-1}^T z_{j-1})
        z = _run_sweep(B, Dinv, bb, trans_H=True, trans_G=True,
                       reverse=False, h_shift=-1, **kw)
        # bwd_t:  x_j = z_j - M_{j+1}^T x_{j+1}
        x = _run_sweep(M, None, z, trans_H=True, trans_G=False,
                       reverse=True, h_shift=+1, **kw)
    return x[:N] if n_pad else x


# ---------------------------------------------------------------------------
# Fused banded factorization (round-5 frontier: probe_jac_stages at nx=192
# measures factorization at 76% of the materialize cost — 250 ms of 330 ms
# per 16-sample chunk — and Newton refactorizes every iteration)
# ---------------------------------------------------------------------------
#
# `factorize_thomas_inv_banded` as an XLA scan issues, per block row, two
# batched matmuls plus a SEPARATE `pallas_call` for the Gauss-Jordan
# inverse — nb kernel launches with every carry round-tripping HBM.  This
# kernel runs the whole recurrence in one launch: grid (batch_tile, nb),
# the Dinv carry lives in VMEM scratch, band blocks stream double-buffered,
# and the blocked GJ inverse runs in-kernel on a VMEM augmented tile.
#
# Recurrence (`ops/structured._factorize_thomas_inv_banded`):
#   M_j    = A_j Dinv_{j-1}            (M_0 = 0)
#   Dinv_j = (D_j - M_j B_{j-1})^{-1}  (blocked Gauss-Jordan, no pivoting)
# Zeroing the carry at j=0 makes the uniform expressions produce M_0 = 0
# and T_0 = D_0 exactly (no masking).  Same no-pivoting contract as
# `batched_inverse` (bc-symmetrized diagonally-dominant FEM operators).


def _gj_invert_ref(aug_ref, bs: int):
    """In-place blocked Gauss-Jordan on an augmented VMEM ref
    (tb, s, 2s) holding [T | I]; on return the right half is T^{-1}.
    Same algorithm/precision as `_gj_blocked_kernel_factory` (rank-bs MXU
    updates, unrolled pivot-block inverse, no pivoting)."""
    def bdot(x, y):
        return jax.lax.dot_general(
            x, y,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=x.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )

    s = aug_ref.shape[2] // 2
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, s, 1), 1)
    for kb in range(0, s, bs):
        w = min(bs, s - kb)
        R = aug_ref[:, kb : kb + w, :]  # (tb, w, 2s)
        App = R[:, :, kb : kb + w]
        r_w = jax.lax.broadcasted_iota(jnp.int32, (1, w, 2 * w), 1)
        c_w = jax.lax.broadcasted_iota(jnp.int32, (1, w, 2 * w), 2)
        eye_w = (c_w - w == r_w).astype(R.dtype)
        augs = jnp.where(
            c_w < w,
            jnp.concatenate([App, App], axis=2),
            jnp.broadcast_to(eye_w, App.shape[:1] + (w, 2 * w)),
        )
        rid_w = jax.lax.broadcasted_iota(jnp.int32, (1, w, 1), 1)
        for k in range(w):
            row = augs[:, k : k + 1, :]
            piv = augs[:, k : k + 1, k : k + 1]
            row_n = row / piv
            col = augs[:, :, k : k + 1]
            col = jnp.where(rid_w == k, 0.0, col)
            augs = jnp.where(rid_w == k, row_n, augs - col * row_n)
        App_inv = augs[:, :, w:]
        Rn = bdot(App_inv, R)  # (tb, w, 2s) normalized pivot rows
        C = aug_ref[:, :, kb : kb + w]  # (tb, s, w)
        in_blk = (row_ids >= kb) & (row_ids < kb + w)
        C = jnp.where(in_blk, 0.0, C)
        aug_ref[...] = aug_ref[...] - bdot(C, Rn)
        aug_ref[:, kb : kb + w, :] = Rn


def _factorize_kernel_factory(bs: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def bdot(x, y):
        return jax.lax.dot_general(
            x, y,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=x.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )

    def kernel(band_ref, M_ref, Dinv_ref, dprev, bprev):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            dprev[...] = jnp.zeros_like(dprev)
            # uninitialized VMEM can decode as NaN/Inf; 0 @ NaN = NaN, so
            # the M_0 = 0 argument alone does not protect the j=0 step
            bprev[...] = jnp.zeros_like(bprev)

        band = band_ref[:, 0]  # (tb, s, 3s)
        s = band.shape[1]
        Aj = band[:, :, :s]
        Dj = band[:, :, s : 2 * s]
        # B_{j-1} rides a VMEM scratch carry (written from last step's band
        # block — no second DMA of the band); garbage at j=0, where M_0 = 0
        # kills the term
        Mj = bdot(Aj, dprev[...])  # = 0 at j = 0
        T = Dj - bdot(Mj, bprev[...])

        def body(aug_ref):
            r_s = jax.lax.broadcasted_iota(jnp.int32, (1, s, s), 1)
            c_s = jax.lax.broadcasted_iota(jnp.int32, (1, s, s), 2)
            aug_ref[:, :, :s] = T
            aug_ref[:, :, s:] = jnp.broadcast_to(
                (r_s == c_s).astype(T.dtype), T.shape
            )
            _gj_invert_ref(aug_ref, bs)
            inv = aug_ref[:, :, s:]
            Dinv_ref[:, 0] = inv
            dprev[...] = inv

        M_ref[:, 0] = Mj
        bprev[...] = band[:, :, 2 * s :]
        pl.run_scoped(body, pltpu.VMEM((T.shape[0], s, 2 * s), T.dtype))

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def banded_factorize_batch(band, interpret: bool = False):
    """Batched inverse-Thomas factorization in ONE fused Pallas launch.

    band: (N, nb, s, 3s) -> (M, Dinv) each (N, nb, s, s), matching
    `ops/structured._factorize_thomas_inv_banded` (B is band[..., 2s:]).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, nb, s, _ = band.shape
    itemsize = band.dtype.itemsize
    # live set: band in x2, B-prev in x2, two outs x2, carry, augmented GJ
    # tile (s, 2s) — budget 28 MB
    sub = -(-s // 8) * 8
    lane = -(-s // 128) * 128
    per = itemsize * sub * lane * (2 * 3 + 2 * 1 + 2 * 2 + 1 + 2 + 2)
    tile = max(1, int(28e6 / per))
    tile = 1 << (tile.bit_length() - 1)
    tile = min(tile, 1 << max(N - 1, 0).bit_length())
    if interpret:
        tile = min(tile, 4)
    n_pad = (-N) % tile
    if n_pad:
        eye = jnp.broadcast_to(jnp.eye(s, dtype=band.dtype), (n_pad, nb, s, s))
        zero = jnp.zeros((n_pad, nb, s, s), dtype=band.dtype)
        pad = jnp.concatenate([zero, eye, zero], axis=3)
        band = jnp.concatenate([band, pad], axis=0)
    out = pl.pallas_call(
        _factorize_kernel_factory(13),
        out_shape=(
            jax.ShapeDtypeStruct(band.shape[:2] + (s, s), band.dtype),
            jax.ShapeDtypeStruct(band.shape[:2] + (s, s), band.dtype),
        ),
        grid=(band.shape[0] // tile, nb),
        in_specs=[
            pl.BlockSpec(
                (tile, 1, s, 3 * s), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (tile, 1, s, s), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile, 1, s, s), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, s, s), band.dtype),  # Dinv carry
            pltpu.VMEM((tile, s, s), band.dtype),  # B_{j-1} carry
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(8 * band.shape[0] * nb * s**3),
            bytes_accessed=int(3 * band.size * itemsize),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(band)
    M, Dinv = out
    return (M[:N], Dinv[:N]) if n_pad else (M, Dinv)


def _small_gj_inverse(App):
    """Sequential unrolled Gauss-Jordan inverse of a small batched block
    (N, w, w), w <= ~16.  No pivoting (diagonally-dominant inputs)."""
    N, w, _ = App.shape
    aug = jnp.concatenate(
        [App, jnp.broadcast_to(jnp.eye(w, dtype=App.dtype), App.shape)], axis=2
    )  # (N, w, 2w)
    for k in range(w):
        rowk = aug[:, k : k + 1, :]  # (N, 1, 2w)
        pivot = rowk[:, :, k : k + 1]  # (N, 1, 1)
        rowk_n = rowk / pivot
        colk = aug[:, :, k : k + 1]  # (N, w, 1)
        colk = colk.at[:, k, :].set(0.0)
        aug = aug - colk * rowk_n
        aug = aug.at[:, k : k + 1, :].set(rowk_n)
    return aug[:, :, w:]


def blocked_inverse(X, bs: int = 13):
    """Batched inverse via BLOCKED Gauss-Jordan in plain XLA.

    Rank-bs updates replace the s sequential rank-1 passes of the scalar
    kernel: per block step, a small (N, bs, bs) pivot inverse (unrolled VPU
    Gauss-Jordan) and two batched matmuls that carry all the flops on the
    MXU.  ~s/bs passes over the augmented matrix instead of s — measured
    2-3x faster than the rank-1 Pallas kernel at s=65 on v5e, with matmul
    accumulation in f32 (`preferred_element_type` via highest precision).

    Same no-pivoting contract as ``batched_inverse`` (diagonally dominant
    blocks from bc-symmetrized FEM operators).
    """
    X = jnp.asarray(X)
    N, s, _ = X.shape
    aug = jnp.concatenate(
        [X, jnp.broadcast_to(jnp.eye(s, dtype=X.dtype), X.shape)], axis=2
    )  # (N, s, 2s)
    for kb in range(0, s, bs):
        w = min(bs, s - kb)
        R = aug[:, kb : kb + w, :]  # (N, w, 2s) pivot rows
        App = R[:, :, kb : kb + w]  # (N, w, w)
        App_inv = _small_gj_inverse(App)
        Rn = jnp.einsum("nij,njl->nil", App_inv, R)  # normalized pivot rows
        C = aug[:, :, kb : kb + w]  # (N, s, w) pivot columns
        C = C.at[:, kb : kb + w, :].set(0.0)
        aug = aug - jnp.einsum("nij,njl->nil", C, Rn)  # rank-w update (MXU)
        aug = aug.at[:, kb : kb + w, :].set(Rn)
    return aug[:, :, s:]


def _gj_blocked_kernel_factory(bs: int):
    """Blocked Gauss-Jordan kernel: rank-bs updates via in-kernel batched
    MXU dots instead of s rank-1 VPU passes.  Per block step: a small
    unrolled GJ inverts the (tb, w, w) pivot block in registers, then two
    batched `dot_general`s normalize the pivot rows and apply the rank-w
    update to the whole augmented tile — ~s/bs passes over VMEM instead of
    s (same no-pivoting contract as `_gj_kernel`)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, out_ref):
        A = a_ref[...]  # (tb, s, s)
        tb, s = A.shape[0], A.shape[-1]

        def bdot(x, y):
            # precision pinned: Mosaic lowers only DEFAULT/HIGHEST, so an
            # ambient jax.default_matmul_precision('high') (the solver
            # precision policy, hippyflow_tpu/config.py) must not leak into
            # the kernel trace.  HIGHEST costs nothing here — the kernel is
            # VMEM-resident and bandwidth-bound, not MXU-bound (measured in
            # benchmarks/probe_precision.py).
            return jax.lax.dot_general(
                x, y,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=x.dtype,  # f32 accum (f64 on CPU tests)
                precision=jax.lax.Precision.HIGHEST,
            )

        def body(aug_ref):
            # identity block via iota compare (jnp.eye would enter the
            # kernel as a captured constant, which pallas_call rejects)
            r_s = jax.lax.broadcasted_iota(jnp.int32, (1, s, s), 1)
            c_s = jax.lax.broadcasted_iota(jnp.int32, (1, s, s), 2)
            aug_ref[:, :, :s] = A
            aug_ref[:, :, s:] = jnp.broadcast_to(
                (r_s == c_s).astype(A.dtype), A.shape
            )
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, s, 1), 1)
            for kb in range(0, s, bs):
                w = min(bs, s - kb)
                R = aug_ref[:, kb : kb + w, :]  # (tb, w, 2s)
                App = R[:, :, kb : kb + w]  # (tb, w, w)
                # unrolled small GJ inverse of the pivot block
                r_w = jax.lax.broadcasted_iota(jnp.int32, (1, w, 2 * w), 1)
                c_w = jax.lax.broadcasted_iota(jnp.int32, (1, w, 2 * w), 2)
                eye_w = (c_w - w == r_w).astype(A.dtype)
                augs = jnp.where(
                    c_w < w,
                    jnp.concatenate([App, App], axis=2),
                    jnp.broadcast_to(eye_w, App.shape[:1] + (w, 2 * w)),
                )  # (tb, w, 2w) = [App | I]
                rid_w = jax.lax.broadcasted_iota(jnp.int32, (1, w, 1), 1)
                for k in range(w):
                    row = augs[:, k : k + 1, :]
                    piv = augs[:, k : k + 1, k : k + 1]
                    row_n = row / piv
                    col = augs[:, :, k : k + 1]
                    col = jnp.where(rid_w == k, 0.0, col)
                    augs = jnp.where(rid_w == k, row_n, augs - col * row_n)
                App_inv = augs[:, :, w:]
                Rn = bdot(App_inv, R)  # (tb, w, 2s) normalized pivot rows
                C = aug_ref[:, :, kb : kb + w]  # (tb, s, w)
                in_blk = (row_ids >= kb) & (row_ids < kb + w)
                C = jnp.where(in_blk, 0.0, C)
                aug_ref[...] = aug_ref[...] - bdot(C, Rn)
                aug_ref[:, kb : kb + w, :] = Rn
            out_ref[...] = aug_ref[:, :, s:]

        pl.run_scoped(body, pltpu.VMEM((tb, s, 2 * s), A.dtype))

    return kernel


@functools.partial(jax.jit, static_argnames=("tile", "bs"))
def _batched_inverse_blocked(X, tile: int, bs: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, s, _ = X.shape
    n_pad = (-N) % tile
    if n_pad:
        eye = jnp.broadcast_to(jnp.eye(s, dtype=X.dtype), (n_pad, s, s))
        X = jnp.concatenate([X, eye], axis=0)
    out = pl.pallas_call(
        _gj_blocked_kernel_factory(bs),
        out_shape=jax.ShapeDtypeStruct(X.shape, X.dtype),
        grid=(X.shape[0] // tile,),
        in_specs=[
            pl.BlockSpec((tile, s, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (tile, s, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * X.shape[0] * s**3),
            bytes_accessed=int(2 * X.size * X.dtype.itemsize),
            transcendentals=0,
        ),
    )(X)
    return out[:N] if n_pad else out
