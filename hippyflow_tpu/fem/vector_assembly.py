"""Multi-component (vector-valued state) Galerkin assembly.

Generalizes `fem/assembly.py` to states with ``ncomp`` P1 components on a
shared mesh — the structure needed for the reference's Helmholtz problem
(real/imaginary split state, `applications/helmholtz_2d/HelmholtzProblem.py:
95-115`) and for vector velocity fields.

Dof layout is component-major: ``u = concat([u_0, ..., u_{ncomp-1}])`` with
each block of length ``n = space.dim``.  The parameter m stays a scalar P1
field.  Pointwise form callables receive per-component values:

    flux(x, u (ncomp,), grad_u (ncomp, 2), m, z, c)   -> (ncomp, 2)
    source(x, u (ncomp,), grad_u (ncomp, 2), m, z, c) -> (ncomp,)

and the residual is  sum_e int F[k] . grad v_k + S[k] v_k  per component k.
As in the scalar case all KKT blocks come from ``jacfwd`` of the element
kernel, so adjoint consistency is automatic.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from .space import FunctionSpace


@dataclass(frozen=True)
class VectorGalerkinForm:
    ncomp: int
    flux: Callable | None = None
    source: Callable | None = None
    quad_degree: int = 2
    symmetric: bool = False
    coefficients: Mapping[str, np.ndarray] = field(default_factory=dict)
    cell_coefficients: Mapping[str, np.ndarray] = field(default_factory=dict)


class VectorBoundGalerkinForm:
    """VectorGalerkinForm bound to (state space, parameter space)."""

    def __init__(self, Vu: FunctionSpace, Vm: FunctionSpace, form: VectorGalerkinForm):
        assert Vu.mesh is Vm.mesh
        self.Vu, self.Vm, self.form = Vu, Vm, form
        self.ncomp = form.ncomp
        mesh = Vu.mesh
        self.cells = jnp.asarray(Vu.cell_dofs)  # (nc, nd)
        self.cells_m = jnp.asarray(Vm.cell_dofs)
        self.nd = Vu.nd
        self.n = Vu.dim
        self.n_total = self.n * self.ncomp
        phi, gphi, xq, wdet = Vu.quad_data(form.quad_degree)
        phi_m, _, _, _ = Vm.quad_data(form.quad_degree)
        self._phi = jnp.asarray(phi)  # (nq, nd)
        self._phi_m = jnp.asarray(phi_m)
        self._xq = jnp.asarray(xq)
        self._wdet = jnp.asarray(wdet)
        self._grads = jnp.asarray(gphi)  # (nc, nq, nd, 2)

        lam, _, _ = Vu.quad_points(form.quad_degree)
        cvals = {}
        for name, dofs in form.coefficients.items():
            dofs = np.asarray(dofs)
            de = dofs[mesh.cells]
            cvals[name] = jnp.asarray(np.einsum("qi,ci...->cq...", lam, de))
        for name, vals in form.cell_coefficients.items():
            vals = np.asarray(vals)
            cvals[name] = jnp.asarray(
                np.repeat(vals[:, None], lam.shape[0], axis=1)
            )
        self._coef = cvals

    # -- element kernel -------------------------------------------------------
    def _r_elem(self, u_e, m_e, z, xq_c, wdet_c, grads_c, coef_c):
        """u_e (nd, ncomp) -> element residual (nd, ncomp).

        grads_c: (nq_g, nd, 2) physical basis gradients; nq_g == 1 means
        constant (P1) and the gradient work is hoisted out of the loop."""
        phi = self._phi  # (nq, nd)
        uq = phi @ u_e  # (nq, ncomp)
        mq = self._phi_m @ m_e  # (nq,)
        const_grad = grads_c.shape[0] == 1
        gu0 = (
            jnp.einsum("ik,id->kd", u_e, grads_c[0]) if const_grad else None
        )  # (ncomp, 2)

        def at_q(q):
            c_q = {k: v[q] for k, v in coef_c.items()}
            g_q = grads_c[0] if const_grad else grads_c[q]
            gu = gu0 if const_grad else jnp.einsum("ik,id->kd", u_e, g_q)
            out = jnp.zeros((self.nd, self.ncomp), dtype=u_e.dtype)
            if self.form.flux is not None:
                F = self.form.flux(xq_c[q], uq[q], gu, mq[q], z, c_q)  # (ncomp,2)
                out = out + jnp.einsum("id,kd->ik", g_q, F)
            if self.form.source is not None:
                S = self.form.source(xq_c[q], uq[q], gu, mq[q], z, c_q)  # (ncomp,)
                out = out + phi[q][:, None] * S[None, :]
            return wdet_c[q] * out

        contrib = jax.vmap(at_q)(jnp.arange(phi.shape[0]))
        return contrib.sum(axis=0)  # (nd, ncomp)

    def _per_cell(self, fn, u, m, z):
        u_comp = u.reshape(self.ncomp, self.n)
        u_e = jnp.transpose(u_comp[:, self.cells], (1, 2, 0))  # (nc, nd, ncomp)
        m_e = m[self.cells_m]
        return jax.vmap(
            lambda ue, me, xq, wd, gr, *co: fn(
                ue, me, z, xq, wd, gr, dict(zip(self._coef.keys(), co))
            )
        )(u_e, m_e, self._xq, self._wdet, self._grads, *self._coef.values())

    # -- entry points ---------------------------------------------------------
    def residual(self, u, m, z=None):
        r_e = self._per_cell(self._r_elem, u, m, z)  # (nc, 3, ncomp)
        segs = (
            self.cells[:, :, None] + jnp.arange(self.ncomp)[None, None, :] * self.n
        )
        return jax.ops.segment_sum(
            r_e.reshape(-1), segs.reshape(-1), num_segments=self.n_total
        )

    def assemble_A(self, u, m, z=None):
        k = jax.jacfwd(self._r_elem, argnums=0)  # (3,ncomp,3,ncomp)
        A_e = self._per_cell(k, u, m, z)
        segs = (
            self.cells[:, :, None] + jnp.arange(self.ncomp)[None, None, :] * self.n
        )  # (nc, 3, ncomp)
        rows = jnp.broadcast_to(segs[:, :, :, None, None], A_e.shape)
        cols = jnp.broadcast_to(segs[:, None, None, :, :], A_e.shape)
        A = jnp.zeros((self.n_total, self.n_total), dtype=A_e.dtype)
        return A.at[rows.reshape(-1), cols.reshape(-1)].add(A_e.reshape(-1))

    def prepare_banded_ordered(self, border) -> None:
        """Materialize the permuted band gather tables for a `BandOrder`
        with interleaved components (helmholtz split-complex P2 state)."""
        if getattr(self, "_ordered_gather", None) is None:
            from .assembly import _build_gather_tables
            from .band_order import ordered_band_indices

            segs = (
                np.asarray(self.cells)[:, :, None]
                + np.arange(self.ncomp)[None, None, :] * self.n
            ).reshape(-1, self.nd * self.ncomp)
            idx = ordered_band_indices(segs, border)
            self._ordered_gather = _build_gather_tables(
                idx, border.nb * border.s * 3 * border.s
            )

    def assemble_A_banded_ordered(self, u, m, z, border):
        """dr/du gathered into PERMUTED (nb, s, 3s) band storage: the
        (nd*ncomp)^2 element blocks land in the row-ordered interleaved
        numbering of `fem/band_order.py`, giving a block-tridiagonal
        operator where the stacked layout is dense-only."""
        from .assembly import _gather_assemble

        k = jax.jacfwd(self._r_elem, argnums=0)
        A_e = self._per_cell(k, u, m, z)  # (nc, nd, ncomp, nd, ncomp)
        flat = _gather_assemble(A_e.reshape(-1), self._ordered_gather)
        return flat.reshape(border.nb, border.s, 3 * border.s)

    def assemble_A_diag(self, u, m, z=None):
        """Diagonal of dr/du (n_total,): Jacobi preconditioner for the
        matrix-free iterative solve path."""
        k = jax.jacfwd(self._r_elem, argnums=0)  # (3,ncomp,3,ncomp)
        A_e = self._per_cell(k, u, m, z)  # (nc, 3, ncomp, 3, ncomp)
        diag_e = jnp.einsum("caibj,ab,ij->cai", A_e,
                            jnp.eye(self.nd, dtype=A_e.dtype),
                            jnp.eye(self.ncomp, dtype=A_e.dtype))
        segs = (
            self.cells[:, :, None] + jnp.arange(self.ncomp)[None, None, :] * self.n
        )
        return jax.ops.segment_sum(
            diag_e.reshape(-1), segs.reshape(-1), num_segments=self.n_total
        )

    def apply_C(self, u, m, dm, z=None):
        _, out = jax.jvp(lambda mm: self.residual(u, mm, z), (m,), (dm,))
        return out

    def apply_Ct(self, u, m, dp, z=None):
        _, pull = jax.vjp(lambda mm: self.residual(u, mm, z), m)
        return pull(dp)[0]


class ComponentObservation:
    """Pointwise observation of one state component of a vector state."""

    materializable = True

    def __init__(self, B_scalar, ncomp: int, component: int = 0):
        self.inner = B_scalar
        self.ncomp = ncomp
        self.component = component

    @property
    def dim(self):
        return self.inner.dim

    @property
    def state_dim(self):
        return self.inner.state_dim * self.ncomp

    def _slice(self, u):
        n = self.inner.state_dim
        return u[self.component * n : (self.component + 1) * n]

    def apply(self, u):
        n = self.inner.state_dim
        if u.ndim == 1:
            return self.inner.apply(self._slice(u))
        return self.inner.apply(
            u[self.component * n : (self.component + 1) * n, :]
        )

    def applyt(self, q):
        n = self.inner.state_dim
        inner = self.inner.applyt(q)
        if q.ndim == 1:
            out = jnp.zeros(n * self.ncomp, dtype=q.dtype)
            return out.at[self.component * n : (self.component + 1) * n].set(inner)
        out = jnp.zeros((n * self.ncomp, q.shape[1]), dtype=q.dtype)
        return out.at[self.component * n : (self.component + 1) * n, :].set(inner)

    def dense(self):
        n = self.inner.state_dim
        Bd = self.inner.dense()
        out = jnp.zeros((Bd.shape[0], n * self.ncomp), dtype=Bd.dtype)
        return out.at[:, self.component * n : (self.component + 1) * n].set(Bd)
