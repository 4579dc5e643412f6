"""Row-ordered banded numbering for P2 / vector states (fem/band_order.py).

The P1-scalar band relies on native row-major numbering; P2 and
multi-component states regain a block-tridiagonal structure through a
static permutation.  These tests pin the ordering's invariants and check
the permuted banded solver path against the dense path to roundoff —
the TPU-native replacement for the reference's sparse reordered MUMPS
factorizations (`helmholtz_2d/HelmholtzProblem.py:137-150`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hippyflow_tpu as hf
from hippyflow_tpu.fem.band_order import (
    ordered_band_mask,
    structured_band_order,
)


def test_band_order_invariants_p2():
    V = hf.FunctionSpace(hf.unit_square_mesh(6, 4), degree=2)
    bo = structured_band_order(V)
    assert bo.s == 2 * (2 * 6 + 1)
    assert bo.nb == 4 + 1
    # order is a permutation; inv inverts it
    assert sorted(bo.order.tolist()) == list(range(V.dim))
    np.testing.assert_array_equal(bo.order[bo.inv], np.arange(V.dim))
    # every cell's dofs span at most adjacent block rows
    pos = bo.inv[np.asarray(V.cell_dofs)]
    blocks = pos // bo.s
    assert (blocks.max(axis=1) - blocks.min(axis=1) <= 1).all()


def test_band_order_interleaved_components():
    V = hf.FunctionSpace(hf.unit_square_mesh(5, 3), degree=2)
    bo = structured_band_order(V, ncomp=2)
    assert bo.s == 2 * 2 * (2 * 5 + 1)
    assert bo.n_total == 2 * V.dim
    # components of one node sit at adjacent band positions
    n = V.dim
    np.testing.assert_array_equal(bo.inv[np.arange(n) + n], bo.inv[np.arange(n)] + 1)
    # mask permutes and pads constrained
    mask = np.zeros(2 * n, dtype=bool)
    mask[3] = True
    mb = ordered_band_mask(mask, bo)
    assert mb[bo.inv[3]] and mb[bo.n_total :].all()
    assert mb[: bo.n_total].sum() == 1


def test_p2_scalar_banded_matches_dense():
    """Nonlinear P2 problem: auto (ordered banded) vs dense — forward,
    incremental forward/adjoint, and KKT blocks agree to roundoff."""
    mesh = hf.unit_square_mesh(9, 7)
    V2 = hf.FunctionSpace(mesh, degree=2)
    V1 = hf.FunctionSpace(mesh)
    bc = hf.DirichletBC.from_predicate(V2, None, 0.0)
    form = hf.GalerkinForm(
        flux=lambda x, u, gu, m, z, c: jnp.exp(m) * gu,
        source=lambda x, u, gu, m, z, c: u**3 - 1.0,
    )
    pde_b = hf.VariationalPDEProblem(V2, V1, form, bc)
    pde_d = hf.VariationalPDEProblem(V2, V1, form, bc, solver="dense")
    assert pde_b._band_order is not None
    m = 0.3 * jnp.sin(3 * jnp.asarray(V1.dof_coords)[:, 0])
    u_b, ib = pde_b.solve_fwd(m)
    u_d, idn = pde_d.solve_fwd(m)
    assert bool(ib.converged) and bool(idn.converged)
    np.testing.assert_allclose(np.asarray(u_b), np.asarray(u_d), atol=1e-11)
    lin_b, lin_d = pde_b.linearize(u_b, m), pde_d.linearize(u_d, m)
    rhs = jnp.asarray(np.random.RandomState(0).randn(V2.dim, 3))
    for adj in (False, True):
        xb = pde_b.solve_incremental(lin_b, rhs, is_adj=adj)
        xd = pde_d.solve_incremental(lin_d, rhs, is_adj=adj)
        np.testing.assert_allclose(np.asarray(xb), np.asarray(xd), atol=1e-10)


def test_helmholtz_vector_banded_matches_dense():
    """The split real/imaginary P2 helmholtz state (the configuration whose
    26574^2 dense matrix cannot even be LU-factorized on TPU) solves
    through the interleaved ordered band and matches the dense path."""
    from applications.helmholtz import helmholtz_linear_observable, helmholtz_prior
    from hippyflow_tpu.models.jacobian import ObservableJacobian

    obs_b, Vh = helmholtz_linear_observable(nx=12, frequency=300)
    obs_d, _ = helmholtz_linear_observable(nx=12, frequency=300, solver="dense")
    assert obs_b.problem._band_order is not None
    prior = helmholtz_prior(Vh)
    m = prior.sample(jax.random.normal(jax.random.PRNGKey(0), (prior.noise_dim,)))
    qb, qd = obs_b.eval(m), obs_d.eval(m)
    np.testing.assert_allclose(np.asarray(qb), np.asarray(qd), atol=1e-11)
    u, info = obs_b.problem.solve_fwd(m)
    assert bool(info.converged)
    Jb = ObservableJacobian(obs_b).materialize(obs_b.problem.linearize(u, m))
    Jd = ObservableJacobian(obs_d).materialize(obs_d.problem.linearize(u, m))
    np.testing.assert_allclose(np.asarray(Jb), np.asarray(Jd), atol=1e-10)


def test_p2_banded_vmapped_batch():
    """The permuted factor is a pytree: vmapped linearize/solve over a
    sample batch works (the shape the AS pipeline uses)."""
    mesh = hf.unit_square_mesh(6, 5)
    V2 = hf.FunctionSpace(mesh, degree=2)
    V1 = hf.FunctionSpace(mesh)
    bc = hf.DirichletBC.from_predicate(V2, None, 0.0)
    form = hf.GalerkinForm(
        flux=lambda x, u, gu, m, z, c: jnp.exp(m) * gu,
        source=lambda x, u, gu, m, z, c: -1.0,
    )
    pde = hf.VariationalPDEProblem(V2, V1, form, bc, is_fwd_linear=True)
    ms = jnp.asarray(0.1 * np.random.RandomState(1).randn(4, V1.dim))

    def one(m):
        u, info = pde.solve_fwd(m)
        lin = pde.linearize(u, m)
        du = pde.solve_incremental(lin, u)
        return u, du, info.converged

    us, dus, ok = jax.jit(jax.vmap(one))(ms)
    assert bool(ok.all())
    for i in range(4):
        u_i, info = pde.solve_fwd(ms[i])
        np.testing.assert_allclose(np.asarray(us[i]), np.asarray(u_i), atol=1e-11)
