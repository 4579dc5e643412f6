"""Dof-axis ('fem') sharded block-tridiagonal operators.

The reference's parallelism strategy #1 is mesh/domain decomposition:
dolfin/PETSc-distributed vectors and matrices over `mesh_constructor_comm`
(`/root/reference/hippyflow/collectives/comm_utils.py:19-40`).  The
TPU-native mapping shards the dof (block-row) axis of banded FEM operators
over the 'fem' axis of the device mesh:

* ``dist_block_tridiag_matmat`` — `shard_map` over block rows with a
  one-block-row halo exchange each way (`lax.ppermute`), the SpMV/halo
  pattern of SURVEY.md §5.8.  O(n s / P) flops per shard, O(s k) bytes on
  the ICI per application.
* ``factorize_distributed_banded`` / ``DistributedBandedFactor`` — a
  partitioned (SPIKE-style) direct solve: every shard factorizes its own
  band chunk independently (block cyclic reduction, `ops/structured.py`),
  interface coupling is captured by two s-column "spikes" per shard, and a
  small replicated reduced system (2P blocks of size s) stitches the
  interface unknowns together.  The local solves are embarrassingly
  parallel over 'fem'; only the O(P s k) interface tips cross the ICI.

Partitioned solve, math
-----------------------
Split the nb block rows into P contiguous chunks.  With D_p the local
block-tridiagonal chunk, A_p = a_{pL} the coupling of chunk p's first row to
its left neighbor's last row, and B_p = b_{(p+1)L-1} the coupling of its last
row to the right neighbor's first row, the global system reads

    D_p x_p + (e_first ⊗ A_p) x_{p-1}^{last} + (e_last ⊗ B_p) x_{p+1}^{first} = f_p.

With y_p = D_p^{-1} f_p and spikes W_p = D_p^{-1}(e_first ⊗ A_p),
V_p = D_p^{-1}(e_last ⊗ B_p):

    x_p = y_p - W_p x_{p-1}^{last} - V_p x_{p+1}^{first}.

Taking the first/last block rows of that identity closes a reduced system in
the 2P interface unknowns (t_p = x_p^{first}, u_p = x_p^{last}) whose matrix
depends only on the spike tips; it is factorized once (dense LU, size 2Ps)
and solved replicated on every shard.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.structured import (
    _transpose_band,
    factorize_block_cyclic,
)


def _pad_band(band, n_parts: int):
    """Pad the block-row axis to a multiple of n_parts with identity rows.

    Pad rows have identity diagonal blocks and zero couplings, so the padded
    matrix is block-diagonal [[A, 0], [0, I]]: solves and matvecs on the
    original rows are unchanged and pad solution entries equal the (zero)
    pad rhs."""
    nb, s = band.shape[0], band.shape[1]
    nb_pad = -(-nb // n_parts) * n_parts
    if nb_pad == nb:
        return band, nb_pad
    pad = jnp.zeros((nb_pad - nb, s, 3 * s), dtype=band.dtype)
    eye = jnp.eye(s, dtype=band.dtype)
    pad = pad.at[:, :, s : 2 * s].set(eye)
    return jnp.concatenate([band, pad], axis=0), nb_pad


def _pad_rhs(X, n: int, n_pad: int):
    if n_pad == n:
        return X
    return jnp.concatenate(
        [X, jnp.zeros((n_pad - n,) + X.shape[1:], dtype=X.dtype)], axis=0
    )


def dist_block_tridiag_matmat(mesh: Mesh, band, X, axis: str = "fem"):
    """A @ X with the block-row axis sharded over ``axis`` of ``mesh``.

    shard_map kernel: each shard multiplies its local band chunk; the
    neighbor block rows it needs (one each way) arrive by `lax.ppermute`
    halo exchange.  Boundary shards receive ppermute's zero fill, which is
    exact because the global matrix has no coupling there (a_0 = b_{nb-1}
    = 0; pad rows couple to nothing)."""
    n_parts = mesh.shape[axis]
    squeeze = X.ndim == 1
    if squeeze:
        X = X[:, None]
    nb, s = band.shape[0], band.shape[1]
    band_p, nb_pad = _pad_band(band, n_parts)
    n_x = X.shape[0]  # may be < nb*s when the band is already padded
    xb = _pad_rhs(X, n_x, nb_pad * s).reshape(nb_pad, s, -1)

    fwd = [(i, i + 1) for i in range(n_parts - 1)]  # halo to the right
    bwd = [(i + 1, i) for i in range(n_parts - 1)]  # halo to the left

    def kernel(band_loc, x_loc):
        a = band_loc[:, :, :s]
        d = band_loc[:, :, s : 2 * s]
        b = band_loc[:, :, 2 * s :]
        left = jax.lax.ppermute(x_loc[-1], axis, fwd)  # neighbor's last row
        right = jax.lax.ppermute(x_loc[0], axis, bwd)  # neighbor's first row
        x_prev = jnp.concatenate([left[None], x_loc[:-1]], axis=0)
        x_next = jnp.concatenate([x_loc[1:], right[None]], axis=0)
        return (
            jnp.einsum("kij,kjl->kil", d, x_loc)
            + jnp.einsum("kij,kjl->kil", a, x_prev)
            + jnp.einsum("kij,kjl->kil", b, x_next)
        )

    spec = P(axis, None, None)
    y = jax.shard_map(
        kernel, mesh=mesh, in_specs=(spec, spec), out_specs=spec
    )(band_p, xb)
    out = y.reshape(nb_pad * s, -1)[:n_x]
    return out[:, 0] if squeeze else out


def _partition_band(band_p, n_parts: int):
    """Split a padded band into per-partition chunks + coupling blocks.

    Returns (local (Pn, L, s, 3s) with boundary couplings zeroed,
    A_c (Pn, s, s) left couplings, B_c (Pn, s, s) right couplings)."""
    nb_pad, s = band_p.shape[0], band_p.shape[1]
    L = nb_pad // n_parts
    chunks = band_p.reshape(n_parts, L, s, 3 * s)
    A_c = chunks[:, 0, :, :s]  # includes a_0 = 0 for p=0
    B_c = chunks[:, -1, :, 2 * s :]
    local = chunks.at[:, 0, :, :s].set(0.0)
    local = local.at[:, -1, :, 2 * s :].set(0.0)
    return local, A_c, B_c


class _SpikeSide:
    """Partitioned factorization of one direction (A or A^T)."""

    def __init__(self, local_fac, W, V, R_lu, R_piv):
        self.local_fac = local_fac  # BlockCyclicFactor batched over partitions
        self.W = W  # (Pn, L*s, s) left spikes
        self.V = V  # (Pn, L*s, s) right spikes
        self.R_lu = R_lu  # (2 Pn s, 2 Pn s) reduced-system LU
        self.R_piv = R_piv

    def leaves(self):
        return (self.local_fac, self.W, self.V, self.R_lu, self.R_piv)


def _build_side(band_p, n_parts: int) -> _SpikeSide:
    nb_pad, s = band_p.shape[0], band_p.shape[1]
    L = nb_pad // n_parts
    local, A_c, B_c = _partition_band(band_p, n_parts)

    def fac_one(chunk):
        a = chunk[:, :, :s]
        d = chunk[:, :, s : 2 * s]
        b = chunk[:, :, 2 * s :]
        return factorize_block_cyclic(d, a, b, with_transpose=False)

    local_fac = jax.vmap(fac_one)(local)

    # spikes: W_p = D_p^{-1} (e_first ⊗ A_p), V_p = D_p^{-1} (e_last ⊗ B_p)
    rhs_W = jnp.zeros((n_parts, L * s, s), dtype=band_p.dtype)
    rhs_W = rhs_W.at[:, :s, :].set(A_c)
    rhs_V = jnp.zeros((n_parts, L * s, s), dtype=band_p.dtype)
    rhs_V = rhs_V.at[:, -s:, :].set(B_c)
    solve_loc = jax.vmap(lambda F, b: F.solve(b))
    W = solve_loc(local_fac, rhs_W)
    V = solve_loc(local_fac, rhs_V)

    # reduced system over interface unknowns [t_0, u_0, t_1, u_1, ...]
    Wf, Wl = W[:, :s, :], W[:, -s:, :]
    Vf, Vl = V[:, :s, :], V[:, -s:, :]
    R = jnp.eye(2 * n_parts * s, dtype=band_p.dtype).reshape(
        2 * n_parts, s, 2 * n_parts, s
    )
    p = jnp.arange(1, n_parts)  # rows with a left neighbor
    R = R.at[2 * p, :, 2 * (p - 1) + 1, :].add(Wf[1:])
    R = R.at[2 * p + 1, :, 2 * (p - 1) + 1, :].add(Wl[1:])
    q = jnp.arange(0, n_parts - 1)  # rows with a right neighbor
    R = R.at[2 * q, :, 2 * (q + 1), :].add(Vf[:-1])
    R = R.at[2 * q + 1, :, 2 * (q + 1), :].add(Vl[:-1])
    R_lu, R_piv = jsl.lu_factor(R.reshape(2 * n_parts * s, 2 * n_parts * s))
    return _SpikeSide(local_fac, W, V, R_lu, R_piv)


def _solve_side(side: _SpikeSide, rhs_pad, s: int):
    """rhs_pad: (nb_pad * s, k) padded rhs; returns padded solution."""
    n_parts = side.W.shape[0]
    L = side.W.shape[1] // s
    f = rhs_pad.reshape(n_parts, L * s, -1)
    k = f.shape[-1]
    y = jax.vmap(lambda F, b: F.solve(b))(side.local_fac, f)  # local solves

    # interface tips -> replicated reduced solve (XLA all-gathers the tips)
    y_red = jnp.stack([y[:, :s, :], y[:, -s:, :]], axis=1)  # (Pn, 2, s, k)
    x_red = jsl.lu_solve(
        (side.R_lu, side.R_piv), y_red.reshape(2 * n_parts * s, k)
    ).reshape(n_parts, 2, s, k)
    t, u = x_red[:, 0], x_red[:, 1]
    zero = jnp.zeros((1, s, k), dtype=f.dtype)
    u_prev = jnp.concatenate([zero, u[:-1]], axis=0)
    t_next = jnp.concatenate([t[1:], zero], axis=0)

    x = (
        y
        - jnp.einsum("pns,psk->pnk", side.W, u_prev)
        - jnp.einsum("pns,psk->pnk", side.V, t_next)
    )
    return x.reshape(n_parts * L * s, k)


@jax.tree_util.register_pytree_node_class
class DistributedBandedFactor:
    """Dof-sharded direct factorization of a block-tridiagonal matrix.

    Drop-in for `BlockCyclicFactor` (same ``solve(rhs, trans=...)``
    surface), so it slots into `Linearization.factor` and the prior solver
    stack unchanged.  Local per-partition work carries a leading partition
    axis meant to live on the 'fem' mesh axis (see ``place_on_mesh``)."""

    def __init__(self, fwd: _SpikeSide, adj: _SpikeSide | None, n: int, s: int):
        self.fwd = fwd
        self.adj = adj
        self.n = n  # true (unpadded) matrix size
        self.s = s

    def tree_flatten(self):
        adj_leaves = None if self.adj is None else self.adj.leaves()
        return (self.fwd.leaves(), adj_leaves), (self.n, self.s, self.adj is None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        n, s, no_adj = aux
        fwd = _SpikeSide(*children[0])
        adj = None if no_adj else _SpikeSide(*children[1])
        return cls(fwd, adj, n, s)

    def solve(self, rhs, trans: bool = False):
        side = self.adj if trans else self.fwd
        assert side is not None, (
            "factorized with with_transpose=False; adjoint solves unavailable"
        )
        squeeze = rhs.ndim == 1
        if squeeze:
            rhs = rhs[:, None]
        n_pad = side.W.shape[0] * side.W.shape[1]
        x = _solve_side(side, _pad_rhs(rhs, self.n, n_pad), self.s)[: self.n]
        return x[:, 0] if squeeze else x


def factorize_distributed_banded(
    band, n_parts: int, with_transpose: bool = True, n_true: int | None = None
) -> DistributedBandedFactor:
    """Partitioned-SPIKE factorization from (nb, s, 3s) band storage.

    Pure traced computation (safe inside jit / Newton loops); use
    ``place_on_mesh`` to pin an eagerly-built factor's partition axis to the
    'fem' mesh axis.  ``n_true`` declares the unpadded system size when the
    input band is already padded (e.g. from `dist_assemble_band`): solves
    then accept/return vectors of that length."""
    nb, s = band.shape[0], band.shape[1]
    band_p, _ = _pad_band(band, n_parts)
    fwd = _build_side(band_p, n_parts)
    adj = None
    if with_transpose:
        a = band_p[:, :, :s]
        d = band_p[:, :, s : 2 * s]
        b = band_p[:, :, 2 * s :]
        a_t, d_t, b_t = _transpose_band(a, d, b)
        adj = _build_side(jnp.concatenate([a_t, d_t, b_t], axis=2), n_parts)
    return DistributedBandedFactor(fwd, adj, n_true or nb * s, s)


def place_on_mesh(factor, mesh: Mesh, axis: str = "fem", sample_axis: str | None = None):
    """Pin every per-partition leaf to ``axis`` and replicate the small
    reduced-system factors.

    Placement is STRUCTURAL, not shape-based: each `_SpikeSide` declares
    which of its leaves carry the partition axis (local_fac/W/V) and which
    are replicated (R_lu/R_piv), so a future leaf whose leading dimension
    coincidentally equals n_parts can never be mis-sharded.

    With ``sample_axis`` the factor is a BATCH of per-sample factors (built
    with ``jax.vmap(factorize_distributed_banded)``): the leading sample
    axis shards over ``sample_axis`` and the partition axis (now axis 1)
    over ``axis`` — the full 2D grid composition of sample x domain
    parallelism (reference strategy #3, `splitCommunicators`,
    `comm_utils.py:19-40`).  Returns a new pytree."""
    assert isinstance(factor, DistributedBandedFactor), (
        "place_on_mesh expects a DistributedBandedFactor"
    )
    lead = () if sample_axis is None else (sample_axis,)

    def put(leaf, partitioned: bool):
        head = lead + ((axis,) if partitioned else ())
        spec = P(*head, *([None] * (jnp.ndim(leaf) - len(head))))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    def place_side(side):
        if side is None:
            return None
        return _SpikeSide(
            jax.tree_util.tree_map(lambda l: put(l, True), side.local_fac),
            put(side.W, True),
            put(side.V, True),
            put(side.R_lu, False),
            put(side.R_piv, False),
        )

    return DistributedBandedFactor(
        place_side(factor.fwd), place_side(factor.adj), factor.n, factor.s
    )


# ---------------------------------------------------------------------------
# Dof-sharded banded assembly
# ---------------------------------------------------------------------------


def partition_cells_by_row(cell_rows: np.ndarray, nb: int, n_parts: int):
    """Static (numpy) partition plan for sharded assembly.

    cell_rows: (nc,) minimum block row touched by each cell.  Cells are
    assigned to the partition owning their minimum row; a cell may also
    scatter into the first row of the NEXT partition (P1 structured cells
    span two adjacent rows), handled by a halo row.  Returns
    (cell_ids (P, Cmax) padded with -1, L) where L = padded rows/partition.
    """
    L = -(-nb // n_parts)
    part_of_cell = np.clip(cell_rows // L, 0, n_parts - 1)
    counts = np.bincount(part_of_cell, minlength=n_parts)
    cmax = int(counts.max())
    cell_ids = np.full((n_parts, cmax), -1, dtype=np.int64)
    for p in range(n_parts):
        ids = np.nonzero(part_of_cell == p)[0]
        cell_ids[p, : len(ids)] = ids
    return cell_ids, L


def dist_assemble_band(
    mesh: Mesh,
    vals_e,
    band_idx,
    cell_ids,
    nb: int,
    s: int,
    axis: str = "fem",
):
    """Assemble a (nb_pad, s, 3s) band with the block-row axis sharded over
    ``axis``: each shard segment-sums its own cells into a local band chunk
    plus ONE halo row (the first row of the next partition), then the halo
    row rides a single `lax.ppermute` hop and is added in — no device ever
    materializes the global band, which is what lets meshes grow past one
    chip's HBM.

    Args:
        vals_e: (nc, e) per-cell flattened element-matrix entries (e = a*a).
        band_idx: (nc, e) flat global band indices (row-major into
            (nb, s, 3s)); -1-padded entries in cell_ids select zeros.
        cell_ids: (P, Cmax) partition plan from `partition_cells_by_row`.
        nb, s: global block rows / block size.
    Returns the band sharded as P(axis, None, None), padded to P*L rows.
    """
    n_parts = mesh.shape[axis]
    L = -(-nb // n_parts)
    vals_e = jnp.asarray(vals_e).reshape(vals_e.shape[0], -1)
    band_idx = jnp.asarray(band_idx).reshape(band_idx.shape[0], -1)
    e = vals_e.shape[1]
    # gather per-partition element data (pad cell -1 -> zero contribution)
    cell_ids_j = jnp.asarray(cell_ids)
    safe = jnp.maximum(cell_ids_j, 0)
    pv = jnp.where((cell_ids_j < 0)[:, :, None], 0.0, vals_e[safe])  # (P,C,e)
    pidx = band_idx[safe]  # (P, C, e) global flat indices
    # local flat index within the shard's (L+1, s, 3s) buffer
    base = (jnp.arange(n_parts) * L)[:, None, None]
    lidx = pidx - base * (3 * s * s)
    lidx = jnp.where((cell_ids_j < 0)[:, :, None], (L + 1) * 3 * s * s, lidx)

    fwd = [(i, i + 1) for i in range(n_parts - 1)]

    def kernel(v, li):
        # v, li: (1, C, e) local slices
        flat = jax.ops.segment_sum(
            v[0].reshape(-1),
            li[0].reshape(-1),
            num_segments=(L + 1) * 3 * s * s,
        ).reshape(L + 1, s, 3 * s)
        halo = jax.lax.ppermute(flat[L], axis, fwd)  # neighbor's overflow row
        out = flat[:L].at[0].add(halo)
        # identity diagonal on pad rows (global row >= nb) keeps the padded
        # band factorizable, matching _pad_band's convention
        row_global = jax.lax.axis_index(axis) * L + jnp.arange(L)
        pad = (row_global >= nb).astype(out.dtype)[:, None, None]
        ri = jax.lax.broadcasted_iota(jnp.int32, (1, s, 3 * s), 1)
        ci = jax.lax.broadcasted_iota(jnp.int32, (1, s, 3 * s), 2)
        eye_blk = (ci - s == ri).astype(out.dtype)
        out = out + pad * eye_blk
        return out[None]

    spec = P(axis, None, None)
    band = jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None, None)),
        out_specs=P(axis, None, None, None),
    )(
        jax.device_put(pv, NamedSharding(mesh, P(axis, None, None))),
        jax.device_put(lidx, NamedSharding(mesh, P(axis, None, None))),
    )
    band = band.reshape(n_parts * L, s, 3 * s)
    return jax.lax.with_sharding_constraint(
        band, NamedSharding(mesh, spec)
    )
