"""Differentiable Galerkin assembly.

TPU-native replacement for dolfin/UFL assembly (`dl.assemble`,
`dl.assemble_system`, `dl.derivative` used in the reference's
`PDEVariationalControlProblem`, `hippyflow/test/setupPoissonControlProblem.py:
116-258`).  Design:

* A weak form is specified by *pointwise* flux/source callables evaluated at
  quadrature points:

      r(u; v) = sum_e  int_e  F(x, u, grad u, m, z, c) . grad v
                        + S(x, u, grad u, m, z, c) * v  dx

  This flux--source Galerkin representation covers every PDE in the reference
  suite (log-diffusion Poisson, advection--reaction--diffusion, screened
  reaction terms) while remaining a pure jax function of the dof vectors.

* All derivative blocks of the KKT system are produced by differentiating the
  *element residual* with ``jax.jacfwd`` and scattering: the A (= dr/du),
  C (= dr/dm), and Cz (= dr/dz) blocks of the reference's
  ``setLinearizationPoint`` (`setupPoissonControlProblem.py:209-233`) come
  from one code path, so they are consistent with the nonlinear residual by
  construction — there is no hand-derived adjoint to get wrong.

* Element kernels are batched over all cells with ``vmap`` and contract on the
  MXU; global scatter uses one segment-sum (vectors) or scatter-add (dense
  matrices).  Shapes are static; everything jits.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from .mesh import boundary_edges
from .space import FunctionSpace


@dataclass(frozen=True)
class GalerkinForm:
    """Weak form ``int F . grad(v) + S v dx``.

    flux(x, u, grad_u, m, z, c)   -> (2,)  [optional]
    source(x, u, grad_u, m, z, c) -> ()    [optional]

    where, at a single quadrature point: ``x`` (2,) is the position, ``u`` the
    state value, ``grad_u`` (2,) its gradient (P1: cellwise constant), ``m``
    the parameter value, ``z`` the *full* control vector (or None), and ``c``
    a dict of coefficient values at this point (see ``coefficients``).

    coefficients: mapping name -> array of dof values on the same P1 space;
    at a quad point ``c[name]`` is the interpolated scalar value and
    ``c['grad_' + name]`` its (2,) gradient. Arrays with shape (n, k) give
    vector-valued coefficients (value shape (k,), gradient (k, 2)).
    cell_coefficients: mapping name -> (nc,) per-cell constants (e.g. cell
    diameter for the SUPG-like stabilization of the confusion problem).
    """

    flux: Callable | None = None
    source: Callable | None = None
    quad_degree: int = 2
    symmetric: bool = False
    coefficients: Mapping[str, np.ndarray] = field(default_factory=dict)
    cell_coefficients: Mapping[str, np.ndarray] = field(default_factory=dict)


class BoundGalerkinForm:
    """A GalerkinForm bound to (state space, parameter space).

    Provides jitted, differentiable entry points:
      residual(u, m, z)          -> (n,)
      assemble_matrix(u,m,z,wrt) -> dense (n, n) or (n, dz) for wrt='z'
    Derivatives w.r.t. u/m/z are exact by ``jacfwd`` of the element kernel.
    """

    def __init__(self, Vu: FunctionSpace, Vm: FunctionSpace, form: GalerkinForm):
        assert Vu.mesh is Vm.mesh, "state/parameter spaces must share a mesh"
        self.Vu, self.Vm, self.form = Vu, Vm, form
        mesh = Vu.mesh
        # state/parameter dofmaps may differ (e.g. P2 state, P1 parameter)
        self.cells = jnp.asarray(Vu.cell_dofs)  # (nc, ndu)
        self.cells_m = jnp.asarray(Vm.cell_dofs)  # (nc, ndm)
        self.n = Vu.dim
        self.n_m = Vm.dim
        phi_u, gphi_u, xq, wdet = Vu.quad_data(form.quad_degree)
        phi_m, _, _, _ = Vm.quad_data(form.quad_degree)
        self._phi = jnp.asarray(phi_u)  # (nq, ndu)
        self._phi_m = jnp.asarray(phi_m)  # (nq, ndm)
        self._xq = jnp.asarray(xq)  # (nc, nq, 2)
        self._wdet = jnp.asarray(wdet)  # (nc, nq)
        self._grads = jnp.asarray(gphi_u)  # (nc, nq, ndu, 2)

        # Precompute coefficient values/gradients at quadrature points
        # (static; coefficients live on P1 vertex dofs).
        geo = Vu.geometry
        nq = phi_u.shape[0]
        lam, _, _ = Vu.quad_points(form.quad_degree)
        cvals = {}
        for name, dofs in form.coefficients.items():
            dofs = np.asarray(dofs)
            de = dofs[mesh.cells]  # (nc, 3) or (nc, 3, k)
            cvals[name] = jnp.asarray(np.einsum("qi,ci...->cq...", lam, de))
            cvals["grad_" + name] = jnp.asarray(
                np.repeat(
                    np.einsum("cid,ci...->c...d", geo.grads, de)[:, None],
                    nq,
                    axis=1,
                )
            )
        for name, vals in form.cell_coefficients.items():
            vals = np.asarray(vals)
            cvals[name] = jnp.asarray(np.repeat(vals[:, None], nq, axis=1))
        self._coef = cvals  # each (nc, nq, ...)

    # -- element kernel ----------------------------------------------------
    def _r_elem(self, u_e, m_e, z, xq_c, wdet_c, grads_c, coef_c):
        """Element residual (ndu,) at one cell; pure in (u_e, m_e, z).

        grads_c: (nq_g, ndu, 2) physical basis gradients at the quadrature
        points; nq_g == 1 means constant gradients (P1) and the per-point
        gradient work is hoisted out of the quadrature loop."""
        phi = self._phi  # (nq, ndu)
        uq = phi @ u_e  # (nq,)
        mq = self._phi_m @ m_e
        const_grad = grads_c.shape[0] == 1
        gu0 = grads_c[0].T @ u_e if const_grad else None  # (2,)

        def at_q(q):
            c_q = {k: v[q] for k, v in coef_c.items()}
            g_q = grads_c[0] if const_grad else grads_c[q]
            gu = gu0 if const_grad else g_q.T @ u_e
            out = jnp.zeros((phi.shape[1],), dtype=u_e.dtype)
            if self.form.flux is not None:
                F = self.form.flux(xq_c[q], uq[q], gu, mq[q], z, c_q)
                out = out + g_q @ F
            if self.form.source is not None:
                S = self.form.source(xq_c[q], uq[q], gu, mq[q], z, c_q)
                out = out + S * phi[q]
            return wdet_c[q] * out

        nq = phi.shape[0]
        contrib = jax.vmap(at_q)(jnp.arange(nq))  # (nq, ndu)
        return contrib.sum(axis=0)

    def _per_cell(self, fn, u, m, z):
        """vmap an element kernel over all cells."""
        u_e = u[self.cells]
        m_e = m[self.cells_m]
        return jax.vmap(
            lambda ue, me, xq, wd, gr, *co: fn(
                ue, me, z, xq, wd, gr, dict(zip(self._coef.keys(), co))
            )
        )(u_e, m_e, self._xq, self._wdet, self._grads, *self._coef.values())

    # -- structured scatter-free assembly tables -----------------------------
    def _structured_tables(self):
        """Static plan for SCATTER-FREE assembly on structured P1 scalar
        meshes (round-5: XLA's scatter/segment-sum is the assembly
        bottleneck on TPU — measured 163 ms of the 225 ms nx=192 linearize,
        /tmp-probe 2026-08-20; see benchmarks/probe_pallas_band.py notes).

        On `rectangle_mesh` the cells array is (ny, nx, 2, 3) with CONSTANT
        per-(type, local-vertex) grid offsets, so every element-matrix entry
        (t, a, b) lands on ONE fixed matrix diagonal d = g2 - g1 (seven
        distinct values).  Assembly then becomes: shifted slice-adds of the
        (ny, nx) element grids into seven (nb, s) diagonal arrays, plus a
        pure-data-movement diagonal->band composition (see
        `_structured_band`).  No scatter, no gather, no segment ids.

        Returns None when the mesh/space does not satisfy the layout (the
        general segment-sum path remains)."""
        if hasattr(self, "_struct_plan"):
            return self._struct_plan
        self._struct_plan = None
        mesh = self.Vu.mesh
        shape = getattr(mesh, "structured_shape", None)
        cells = np.asarray(self.cells)
        if (
            shape is not None
            and self.Vu.degree == 1
            and cells.shape[1] == 3
            and np.array_equal(cells, np.asarray(self.Vm.cell_dofs))
        ):
            nx, ny = shape
            s = nx + 1
            if cells.shape[0] == 2 * nx * ny:
                C = cells.reshape(ny, nx, 2, 3)
                base = np.arange(ny)[:, None] * s + np.arange(nx)[None, :]
                offs = np.zeros((2, 3, 2), dtype=int)
                ok = True
                for t in range(2):
                    for a in range(3):
                        rel = C[:, :, t, a] - base
                        if not (rel == rel[0, 0]).all():
                            ok = False
                            break
                        offs[t, a] = divmod(int(rel[0, 0]), s)
                if ok:
                    from collections import defaultdict

                    plan = defaultdict(list)
                    for t in range(2):
                        for a in range(3):
                            for b in range(3):
                                d = (offs[t, b, 0] - offs[t, a, 0]) * s + (
                                    offs[t, b, 1] - offs[t, a, 1]
                                )
                                plan[int(d)].append(
                                    (t, a, b, int(offs[t, a, 0]),
                                     int(offs[t, a, 1]))
                                )
                    self._struct_plan = (nx, ny, s, dict(plan), offs)
        return self._struct_plan

    def _structured_residual(self, r_e, plan):
        nx, ny, s, _, offs = plan
        E = r_e.reshape(ny, nx, 2, 3)
        r = jnp.zeros((ny + 1, s), dtype=r_e.dtype)
        for t in range(2):
            for a in range(3):
                dy, dx = int(offs[t, a, 0]), int(offs[t, a, 1])
                r = r.at[dy : dy + ny, dx : dx + nx].add(E[:, :, t, a])
        return r.reshape(self.n)

    def _structured_band(self, A_e, plan):
        """Diagonal accumulation + the stride-(3s+1) flat-view placement:
        band-flat position of a diagonal-d entry at in-block row i is
        i*(3s+1) + (s+d), so each diagonal is ONE COLUMN of the band padded
        to width 3s+1.  Composition is a single one-hot matmul (K=7
        diagonals -> W columns) rather than a K-way concatenate: one
        dot_general both compiles faster and avoids an XLA:CPU miscompile
        observed with the concat+reshape-slice form (heap corruption that
        crashed LATER compiles; caught by the round-5 full-suite bisect —
        keep this form unless that is understood)."""
        nx, ny, s, dplan, offs = plan
        nb = ny + 1
        E = A_e.reshape(ny, nx, 2, 3, 3)
        W = 3 * s + 1
        ds = sorted(dplan)
        diags = []
        onehot = np.zeros((len(ds), W), dtype=A_e.dtype)
        for k, d in enumerate(ds):
            acc = jnp.zeros((nb, s), dtype=A_e.dtype)
            for (t, a, b, dy, dx) in dplan[d]:
                acc = acc.at[dy : dy + ny, dx : dx + nx].add(E[:, :, t, a, b])
            c = (s + d) % W
            if (s + d - c) // W == -1:
                # d < -s: lands one view-row up at column 3s; the dropped
                # acc[:, 0] is structurally zero (no element couples the
                # left edge to the previous grid row's right edge)
                acc = jnp.concatenate(
                    [acc[:, 1:], jnp.zeros((nb, 1), dtype=acc.dtype)], axis=1
                )
            diags.append(acc)
            onehot[k, c] = 1.0
        stacked = jnp.stack(diags, axis=2)  # (nb, s, K)
        buf = stacked @ jnp.asarray(onehot, dtype=A_e.dtype)  # (nb, s, W)
        return (
            buf.reshape(nb, s * W)[:, : 3 * s * s].reshape(nb, s, 3 * s)
        )

    # -- public entry points -------------------------------------------------
    def residual(self, u, m, z=None):
        """Global residual vector r(u, m, z) of shape (n,)."""
        r_e = self._per_cell(self._r_elem, u, m, z)  # (nc, ndu)
        plan = self._structured_tables()
        if plan is not None:
            return self._structured_residual(r_e, plan)
        return jax.ops.segment_sum(
            r_e.reshape(-1), self.cells.reshape(-1), num_segments=self.n
        )

    def assemble_A(self, u, m, z=None):
        """Dense dr/du (n, n). Reference: the `A` KKT block
        (`setupPoissonControlProblem.py:221`)."""
        k = jax.jacfwd(self._r_elem, argnums=0)
        A_e = self._per_cell(k, u, m, z)  # (nc, 3, 3)
        return self._scatter_matrix(A_e)

    def assemble_C(self, u, m, z=None):
        """Dense dr/dm (n, n_m). Reference: the `C` KKT block."""
        k = jax.jacfwd(self._r_elem, argnums=1)
        C_e = self._per_cell(k, u, m, z)  # (nc, ndu, ndm)
        rows = jnp.broadcast_to(self.cells[:, :, None], C_e.shape)
        cols = jnp.broadcast_to(self.cells_m[:, None, :], C_e.shape)
        C = jnp.zeros((self.n, self.n_m), dtype=C_e.dtype)
        return C.at[rows.reshape(-1), cols.reshape(-1)].add(C_e.reshape(-1))

    def assemble_Cz(self, u, m, z):
        """Dense dr/dz (n, dz). Reference: the `Cz` KKT block."""
        k = jax.jacfwd(self._r_elem, argnums=2)
        Cz_e = self._per_cell(k, u, m, z)  # (nc, 3, dz)
        dz = Cz_e.shape[-1]
        return jax.ops.segment_sum(
            Cz_e.reshape(-1, dz), self.cells.reshape(-1), num_segments=self.n
        )

    def apply_C(self, u, m, dm, z=None):
        """Matrix-free C @ dm via jvp of the residual in m."""
        _, out = jax.jvp(lambda mm: self.residual(u, mm, z), (m,), (dm,))
        return out

    def apply_Ct(self, u, m, dp, z=None):
        """Matrix-free C^T @ dp via vjp of the residual in m."""
        _, pull = jax.vjp(lambda mm: self.residual(u, mm, z), m)
        return pull(dp)[0]

    def apply_Czt(self, u, m, z, dp):
        _, pull = jax.vjp(lambda zz: self.residual(u, m, zz), z)
        return pull(dp)[0]

    def _scatter_matrix(self, vals_e):
        rows = jnp.broadcast_to(self.cells[:, :, None], vals_e.shape)
        cols = jnp.broadcast_to(self.cells[:, None, :], vals_e.shape)
        A = jnp.zeros((self.n, self.n), dtype=vals_e.dtype)
        return A.at[rows.reshape(-1), cols.reshape(-1)].add(vals_e.reshape(-1))

    # -- banded (block-tridiagonal) assembly ---------------------------------
    def _band_indices(self, s: int):
        """Static scatter indices mapping element-matrix entries into the
        (nb, s, 3s) block-tridiagonal band layout: band[j, i, o*s + i2] =
        A[j*s + i, (j + o - 1)*s + i2].  Valid on structured row-major meshes
        where every coupling satisfies |row(g1) - row(g2)| <= 1."""
        if getattr(self, "_band_idx_cache", None) is None:
            self._band_idx_cache = {}
        if s not in self._band_idx_cache:
            # Must be called OUTSIDE any trace first (prepare_banded at
            # problem construction): the device array then enters traced
            # programs as a closure *parameter*. Creating it inside a trace
            # would inline nc*9 int64s into the HLO (tens of MB at large nx)
            # and caching a trace-local value would leak the tracer.
            from . import native

            cells = np.asarray(self.cells)
            idx = native.band_indices(cells, s)
            if idx is None:  # numpy fallback
                g1 = np.repeat(cells, 3, axis=1).reshape(-1)  # rows, (nc*9,)
                g2 = np.tile(cells, (1, 3)).reshape(-1)  # cols
                o = g2 // s - g1 // s + 1
                assert ((o >= 0) & (o <= 2)).all(), (
                    "mesh numbering is not block-tridiagonal at this block size"
                )
                idx = g1 * (3 * s) + o * s + (g2 % s)
            self._band_idx_cache[s] = jnp.asarray(idx)
        return self._band_idx_cache[s]

    def prepare_banded(self, s: int) -> None:
        """Eagerly materialize the band assembly tables (call at problem
        construction, outside jit).  Structured P1 meshes need only the
        tiny scatter-free plan; others materialize the band scatter
        indices on device."""
        plan = self._structured_tables()
        if plan is None or plan[2] != s:
            self._band_indices(s)

    def assemble_A_diag(self, u, m, z=None):
        """Diagonal of dr/du (n,): the Jacobi preconditioner for the
        matrix-free iterative solve path — one element-kernel pass, no
        matrix."""
        k = jax.jacfwd(self._r_elem, argnums=0)
        A_e = self._per_cell(k, u, m, z)  # (nc, 3, 3)
        diag_e = jnp.diagonal(A_e, axis1=1, axis2=2)  # (nc, 3)
        return jax.ops.segment_sum(
            diag_e.reshape(-1), self.cells.reshape(-1), num_segments=self.n
        )

    def assemble_A_banded(self, u, m, z, s: int):
        """dr/du in block-tridiagonal band storage (nb, s, 3s): the memory-
        and bandwidth-lean path for structured meshes — O(n s) instead of the
        dense O(n^2), which is what lets sample chunks be large on-chip.

        Structured P1 meshes take the SCATTER-FREE diagonal path
        (`_structured_tables`); the segment-sum fallback covers everything
        else."""
        k = jax.jacfwd(self._r_elem, argnums=0)
        A_e = self._per_cell(k, u, m, z)  # (nc, 3, 3)
        plan = self._structured_tables()
        if plan is not None and plan[2] == s:
            return self._structured_band(A_e, plan)
        idx = self._band_indices(s)
        flat = jax.ops.segment_sum(
            A_e.reshape(-1), idx, num_segments=self.n * 3 * s
        )
        return flat.reshape(self.n // s, s, 3 * s)

    def prepare_banded_ordered(self, border) -> None:
        """Materialize the permuted band scatter indices for a BandOrder
        (P2 path; the P1 fast path uses `prepare_banded`).  Call at problem
        construction, outside jit."""
        if getattr(self, "_ordered_gather", None) is None:
            from .band_order import ordered_band_indices

            idx = ordered_band_indices(np.asarray(self.cells), border)
            self._ordered_gather = _build_gather_tables(
                idx, border.nb * border.s * 3 * border.s
            )

    def assemble_A_banded_ordered(self, u, m, z, border):
        """dr/du gathered into PERMUTED (nb, s, 3s) band storage following
        a `BandOrder` (structured P2 spaces, `fem/band_order.py`)."""
        k = jax.jacfwd(self._r_elem, argnums=0)
        A_e = self._per_cell(k, u, m, z)
        flat = _gather_assemble(A_e.reshape(-1), self._ordered_gather)
        return flat.reshape(border.nb, border.s, 3 * border.s)


def _build_gather_tables(idx_np: np.ndarray, out_size: int):
    """Static tables turning a scatter-add assembly into two gathers.

    idx_np: (ne,) flat band index of each element-matrix entry.  Returns
    (contrib (nnz, cmax) element-entry ids per nonzero band slot, padded
    with ne -> a zero pad value; expand (out_size,) nonzero-slot rank per
    band position, padded with nnz)."""
    idx_np = np.asarray(idx_np, dtype=np.int64)
    ne = idx_np.size
    u, inv = np.unique(idx_np, return_inverse=True)
    nnz = u.size
    order = np.argsort(inv, kind="stable")
    counts = np.bincount(inv, minlength=nnz)
    starts = np.zeros(nnz, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    cmax = int(counts.max())
    contrib = np.full((nnz, cmax), ne, dtype=np.int64)
    for c in range(cmax):
        sel = counts > c
        contrib[sel, c] = order[starts[sel] + c]
    expand = np.full(out_size, nnz, dtype=np.int64)
    expand[u] = np.arange(nnz)
    return jnp.asarray(contrib), jnp.asarray(expand)


def _gather_assemble(A_e_flat, tables):
    """Two-gather band assembly: sum each nonzero slot's (<= cmax) element
    contributions, then expand to the full band layout (zeros elsewhere)."""
    contrib, expand = tables
    pad = jnp.zeros((1,), dtype=A_e_flat.dtype)
    vals = jnp.concatenate([A_e_flat, pad])[contrib].sum(axis=1)  # (nnz,)
    return jnp.concatenate([vals, pad])[expand]


# ---------------------------------------------------------------------------
# Canonical matrices
# ---------------------------------------------------------------------------


def mass_matrix(V: FunctionSpace, dtype=None) -> jnp.ndarray:
    """Dense consistent mass matrix (P1 closed form / P2 quadrature).
    Reference: `hippyflow/modeling/PODProjector.py:311`."""
    dtype = dtype or config.default_dtype()
    if V.degree == 1:
        vols = V.geometry.volumes
        local = (np.full((3, 3), 1.0) + np.eye(3)) / 12.0
        M_e = vols[:, None, None] * local[None]
        return _scatter_dense(V.mesh, jnp.asarray(M_e, dtype=dtype), V.dim)
    phi, gphi, xq, wdet = V.quad_data(2 * V.degree)
    M_e = np.einsum("qi,qj,cq->cij", phi, phi, wdet)
    return _scatter_dofs(V, jnp.asarray(M_e, dtype=dtype))


def stiffness_matrix(
    V: FunctionSpace, tensor: np.ndarray | None = None, dtype=None
) -> jnp.ndarray:
    """Dense stiffness matrix int (Theta grad u) . grad v dx with an optional
    constant anisotropic tensor Theta (2,2). Reference: the AnisTensor2D
    stiffness of the BiLaplacian prior (`hippyflow/modeling/maternPrior.py:24`)."""
    dtype = dtype or config.default_dtype()
    if tensor is None:
        tensor = np.eye(2)
    if V.degree == 1:
        geo = V.geometry
        g = geo.grads  # (nc, 3, 2)
        K_e = np.einsum("cid,de,cje,c->cij", g, tensor, g, geo.volumes)
        return _scatter_dense(V.mesh, jnp.asarray(K_e, dtype=dtype), V.dim)
    phi, gphi, xq, wdet = V.quad_data(2 * V.degree)
    K_e = np.einsum("cqid,de,cqje,cq->cij", gphi, tensor, gphi, wdet)
    return _scatter_dofs(V, jnp.asarray(K_e, dtype=dtype))


def boundary_mass_matrix(V: FunctionSpace, dtype=None) -> jnp.ndarray:
    """Dense boundary mass matrix int_dOmega u v ds (P1 on boundary edges).
    Used for the Robin correction of the BiLaplacian prior and the
    boundary-restricted KLE (`hippyflow/modeling/KLEProjector.py:379`)."""
    dtype = dtype or config.default_dtype()
    assert V.degree == 1, "boundary mass matrix implemented for P1 spaces"
    edges = boundary_edges(V.mesh)
    x = V.mesh.vertices[edges]  # (ne, 2, 2)
    lens = np.sqrt(((x[:, 1] - x[:, 0]) ** 2).sum(-1))  # (ne,)
    local = np.array([[2.0, 1.0], [1.0, 2.0]]) / 6.0
    Me = lens[:, None, None] * local[None]
    rows = np.broadcast_to(edges[:, :, None], Me.shape)
    cols = np.broadcast_to(edges[:, None, :], Me.shape)
    M = jnp.zeros((V.dim, V.dim), dtype=dtype)
    return M.at[rows.reshape(-1), cols.reshape(-1)].add(
        jnp.asarray(Me.reshape(-1), dtype=dtype)
    )


def _scatter_dense(mesh, vals_e, n):
    cells = jnp.asarray(mesh.cells)
    rows = jnp.broadcast_to(cells[:, :, None], vals_e.shape)
    cols = jnp.broadcast_to(cells[:, None, :], vals_e.shape)
    A = jnp.zeros((n, n), dtype=vals_e.dtype)
    return A.at[rows.reshape(-1), cols.reshape(-1)].add(vals_e.reshape(-1))


def banded_from_elements(V: FunctionSpace, vals_e, connectivity=None) -> np.ndarray:
    """Scatter (ncell, a, a) element matrices into (nb, s, 3s) band storage
    on a structured P1 mesh (numpy, one-time host work).  ``connectivity``
    defaults to the triangle cells; pass boundary edges (ne, 2) with 2x2
    element matrices for boundary mass terms."""
    assert V.degree == 1 and V.mesh.structured_shape is not None
    s = V.mesh.structured_shape[0] + 1
    conn = np.asarray(V.mesh.cells if connectivity is None else connectivity)
    a = conn.shape[1]
    vals_e = np.asarray(vals_e)
    g1 = np.repeat(conn, a, axis=1).reshape(-1).astype(np.int64)
    g2 = np.tile(conn, (1, a)).reshape(-1).astype(np.int64)
    o = g2 // s - g1 // s + 1
    assert ((o >= 0) & (o <= 2)).all(), "connectivity exceeds the band"
    idx = g1 * (3 * s) + o * s + (g2 % s)
    flat = np.zeros(V.dim * 3 * s, dtype=vals_e.dtype)
    np.add.at(flat, idx, vals_e.reshape(-1))
    return flat.reshape(V.dim // s, s, 3 * s)


def mass_matrix_banded(V: FunctionSpace, dtype=None) -> np.ndarray:
    """(nb, s, 3s) band of the consistent P1 mass matrix."""
    dtype = dtype or config.default_dtype()
    vols = V.geometry.volumes
    local = (np.full((3, 3), 1.0) + np.eye(3)) / 12.0
    M_e = (vols[:, None, None] * local[None]).astype(np.dtype(dtype))
    return banded_from_elements(V, M_e)


def stiffness_matrix_banded(
    V: FunctionSpace, tensor: np.ndarray | None = None, dtype=None
) -> np.ndarray:
    """(nb, s, 3s) band of the P1 stiffness matrix (optional tensor)."""
    dtype = dtype or config.default_dtype()
    geo = V.geometry
    if tensor is None:
        tensor = np.eye(2)
    K_e = np.einsum("cid,de,cje,c->cij", geo.grads, tensor, geo.grads, geo.volumes)
    return banded_from_elements(V, K_e.astype(np.dtype(dtype)))


def boundary_mass_matrix_banded(V: FunctionSpace, dtype=None) -> np.ndarray:
    """(nb, s, 3s) band of the boundary mass matrix."""
    dtype = dtype or config.default_dtype()
    edges = boundary_edges(V.mesh)
    x = V.mesh.vertices[edges]
    lens = np.sqrt(((x[:, 1] - x[:, 0]) ** 2).sum(-1))
    local = np.array([[2.0, 1.0], [1.0, 2.0]]) / 6.0
    Me = (lens[:, None, None] * local[None]).astype(np.dtype(dtype))
    return banded_from_elements(V, Me, connectivity=edges)


def _scatter_dofs(V, vals_e):
    """Scatter (nc, nd, nd) element matrices with the space's dofmap."""
    dofs = jnp.asarray(V.cell_dofs)
    rows = jnp.broadcast_to(dofs[:, :, None], vals_e.shape)
    cols = jnp.broadcast_to(dofs[:, None, :], vals_e.shape)
    A = jnp.zeros((V.dim, V.dim), dtype=vals_e.dtype)
    return A.at[rows.reshape(-1), cols.reshape(-1)].add(vals_e.reshape(-1))


# ---------------------------------------------------------------------------
# Dirichlet boundary conditions
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DirichletBC:
    """Dirichlet condition u = g on masked dofs.

    mask: (n,) bool numpy array of constrained dofs.
    value: (n,) dof values of g (ignored off the mask).
    Replaces `dl.DirichletBC` (`setupPoissonControlProblem.py:403-404`).
    """

    mask: np.ndarray
    value: np.ndarray

    @staticmethod
    def from_predicate(V: FunctionSpace, predicate, value=0.0) -> "DirichletBC":
        mask = V.boundary_dofs(predicate)
        if callable(value):
            g = np.asarray(value(V.dof_coords), dtype=np.float64)
        else:
            g = np.full(V.dim, float(value))
        return DirichletBC(mask=mask, value=np.where(mask, g, 0.0))

    def homogenized(self) -> "DirichletBC":
        """bc0 equivalent: same dofs, zero values."""
        return DirichletBC(mask=self.mask, value=np.zeros_like(self.value))


def mask_residual(r, u, bc: DirichletBC):
    """Replace constrained rows of the residual with (u - g).

    Differentiating this masked residual gives identity rows in A and zero
    rows in C — exactly the reference's bc0 treatment of the KKT blocks
    (`setupPoissonControlProblem.py:221-226`).

    Static fast path: an all-false mask (e.g. the PML helmholtz problem,
    which has no Dirichlet rows) returns r untouched — keeps the dead
    select and its jvp/vjp out of every traced residual, which shrinks the
    heavily-recompiled forward/Jacobian programs."""
    if isinstance(bc.mask, np.ndarray) and not bc.mask.any():
        return r
    mask = jnp.asarray(bc.mask)
    g = jnp.asarray(bc.value, dtype=r.dtype)
    return jnp.where(mask, u - g, r)


def bc_symmetrize(A, bc: DirichletBC):
    """Symmetric elimination: zero constrained rows+columns, unit diagonal.
    Solutions agree with row-only elimination for rhs vanishing on the mask,
    and symmetry is preserved so SPD systems stay Cholesky-solvable."""
    mask = jnp.asarray(bc.mask)
    keep = (~mask).astype(A.dtype)
    A = A * keep[:, None] * keep[None, :]
    return A + jnp.diag(mask.astype(A.dtype))


def band_bc_masks(bc: DirichletBC, s: int, dtype=None):
    """Static (keep_row (nb,s,1), keep_col (nb,1,3s), diag (nb,s,3s)) masks
    implementing bc_symmetrize on the (nb, s, 3s) band layout of
    ``assemble_A_banded``."""
    dtype = dtype or config.default_dtype()
    mask = np.asarray(bc.mask)
    n = mask.shape[0]
    nb = n // s
    keep = (~mask).astype(dtype).reshape(nb, s)
    keep_row = keep[:, :, None]  # (nb, s, 1)
    # column (j, o*s + i2) refers to global dof (j + o - 1)*s + i2
    keep_col = np.ones((nb, 3 * s), dtype=dtype)
    for o in range(3):
        jj = np.arange(nb) + o - 1
        valid = (jj >= 0) & (jj < nb)
        keep_col[valid, o * s : (o + 1) * s] = keep[jj[valid]]
        keep_col[~valid, o * s : (o + 1) * s] = 0.0
    diag = np.zeros((nb, s, 3 * s), dtype=dtype)
    ii = np.arange(s)
    diag[:, ii, s + ii] = mask.reshape(nb, s).astype(dtype)
    # device arrays, to be created OUTSIDE any trace and cached by the
    # caller: inside traced programs they are then closure parameters, not
    # inlined HLO constants (the diag mask alone is n*3s elements)
    return (
        jnp.asarray(keep_row),
        jnp.asarray(keep_col[:, None, :]),
        jnp.asarray(diag),
    )


def bc_symmetrize_banded(band, keep_row, keep_col, diag):
    """Apply precomputed band_bc_masks: zero constrained rows/cols in band
    storage and put ones on their diagonal."""
    return band * keep_row * keep_col + diag


def bc_symmetrize_banded_from_mask(band, bc: DirichletBC):
    """bc_symmetrize on (nb, s, 3s) band storage with the masks built
    in-trace from the (n,) Dirichlet mask.  The expanded masks are n*3s
    elements — inlining them as HLO constants costs O(100MB) at large nx,
    while this construction carries only the (n,) mask."""
    return bc_symmetrize_banded_masked(band, jnp.asarray(bc.mask))


def bc_symmetrize_banded_masked(band, mask):
    """bc_symmetrize on band storage from a raw (nb*s,) constrained-dof
    mask (already in band order; pad positions count as constrained)."""
    nb, s = band.shape[0], band.shape[1]
    mask01 = jnp.asarray(mask).astype(band.dtype).reshape(nb, s)
    keep = 1.0 - mask01  # (nb, s)
    zero_row = jnp.zeros((1, s), dtype=band.dtype)
    keep_up = jnp.concatenate([zero_row, keep[:-1]], axis=0)  # row j-1
    keep_dn = jnp.concatenate([keep[1:], zero_row], axis=0)  # row j+1
    keep_col = jnp.concatenate([keep_up, keep, keep_dn], axis=1)[:, None, :]
    band = band * keep[:, :, None] * keep_col
    ii = np.arange(s)
    return band.at[:, ii, s + ii].add(mask01)


def bc_zero_rows(Mat, bc: DirichletBC):
    keep = (~jnp.asarray(bc.mask)).astype(Mat.dtype)
    return Mat * keep[:, None]


def bc_apply_rhs(b, bc: DirichletBC, A_unconstrained=None):
    """Lift inhomogeneous BCs: b' = (I-Z) g + Z (b - A g) with g supported on
    the mask. When A_unconstrained is None the coupling term is omitted
    (valid for g = 0)."""
    mask = jnp.asarray(bc.mask)
    g = jnp.asarray(bc.value, dtype=b.dtype)
    if A_unconstrained is not None:
        b = b - A_unconstrained @ jnp.where(mask, g, 0.0)
    return jnp.where(mask, g, b)
