"""MultiPDEProblem / MultiStateLinearObservable tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hippyflow_tpu as hf
from hippyflow_tpu.models import (
    BlockVector,
    MultiPDEProblem,
    MultiStateLinearObservable,
    PointwiseObservation,
)


def _poisson_problem(V, source_center):
    def flux(x, u, gu, m, z, c):
        return jnp.exp(m) * gu

    def source(x, u, gu, m, z, c):
        return -jnp.exp(
            -50.0 * ((x[0] - source_center[0]) ** 2 + (x[1] - source_center[1]) ** 2)
        )

    form = hf.GalerkinForm(flux=flux, source=source, quad_degree=3, symmetric=True)
    bc = hf.DirichletBC.from_predicate(V, None, 0.0)
    return hf.VariationalPDEProblem(V, V, form, bc, is_fwd_linear=True)


@pytest.fixture(scope="module")
def multi():
    V = hf.FunctionSpace(hf.unit_square_mesh(8))
    problems = [_poisson_problem(V, c) for c in [(0.3, 0.3), (0.7, 0.7)]]
    mp = MultiPDEProblem(problems)
    B = PointwiseObservation(V, np.array([[0.5, 0.5], [0.25, 0.5]]))
    obs = MultiStateLinearObservable(mp, B)
    return V, mp, obs, problems


def test_multi_solve_matches_individual(multi):
    V, mp, obs, problems = multi
    m = 0.2 * jax.random.normal(jax.random.PRNGKey(0), (V.dim,))
    u, info = mp.solve_fwd(m)
    assert u.shape == (2, V.dim)
    assert bool(info.converged)
    for k, p in enumerate(problems):
        uk, _ = p.solve_fwd(m)
        np.testing.assert_allclose(np.asarray(u[k]), np.asarray(uk), rtol=1e-12)


def test_multi_observable_sums(multi):
    V, mp, obs, problems = multi
    m = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (V.dim,))
    q = obs.eval(m)
    expected = sum(
        obs.Bs[k].apply(problems[k].solve_fwd(m)[0]) for k in range(2)
    )
    np.testing.assert_allclose(np.asarray(q), np.asarray(expected), rtol=1e-12)


def test_multi_jacobian_adjoint(multi):
    """J dm vs FD and dot-test through the multi-problem plumbing."""
    V, mp, obs, problems = multi
    m = 0.2 * jax.random.normal(jax.random.PRNGKey(2), (V.dim,))
    u, _ = mp.solve_fwd(m)
    lins = mp.linearize(u, m)
    dm = jax.random.normal(jax.random.PRNGKey(3), (V.dim,))
    dq = jax.random.normal(jax.random.PRNGKey(4), (obs.dQ,))

    # J dm = -B A^{-1} C dm summed over problems
    rhs = obs.applyC(lins, dm)
    uhat = obs.solveFwdIncremental(lins, rhs)
    Jdm = -obs.evalu(uhat)
    # J^T dq
    rhs_adj = obs.applyBt(dq)
    phat = obs.solveAdjIncremental(lins, rhs_adj)
    Jtdq = -obs.applyCt(lins, phat)
    lhs = float(dq @ Jdm)
    rhs_val = float(Jtdq @ dm)
    assert abs(lhs - rhs_val) / abs(lhs) < 1e-12
    # FD check
    eps = 1e-6
    fd = (obs.eval(m + eps * dm) - obs.eval(m - eps * dm)) / (2 * eps)
    assert float(jnp.linalg.norm(fd - Jdm) / jnp.linalg.norm(Jdm)) < 1e-7


def test_block_vector():
    bv = BlockVector([jnp.ones(3), jnp.full(2, 2.0)])
    bv2 = BlockVector([jnp.full(3, 2.0), jnp.ones(2)])
    bv.axpy(0.5, bv2)
    np.testing.assert_allclose(np.asarray(bv[0]), 2.0)
    np.testing.assert_allclose(np.asarray(bv[1]), 2.5)
    assert float(bv.inner(bv2)) == pytest.approx(2 * 3 * 2 + 2.5 * 2)
    bv.zero()
    assert float(bv.inner(bv)) == 0.0


def test_block_vector_export_vtk(tmp_path):
    """BlockVector.export writes ParaView-readable legacy VTK files
    (reference blockVector.py:93-96 streams each snapshot into a .pvd)."""
    from hippyflow_tpu.fem.mesh import unit_square_mesh

    mesh = unit_square_mesh(3)
    nv = mesh.num_vertices
    bv = BlockVector([jnp.arange(nv, dtype=jnp.float64),
                      jnp.ones(nv, dtype=jnp.float64)])
    paths = bv.export(mesh, str(tmp_path / "snaps"), name="u")
    assert len(paths) == 2
    for k, p in enumerate(paths):
        text = open(p).read()
        assert text.startswith("# vtk DataFile Version 3.0")
        assert f"POINTS {nv} double" in text
        assert "CELL_TYPES" in text and "SCALARS u double 1" in text
    # field values round-trip: last nv lines of file 0 are 0..nv-1
    vals = [float(v) for v in open(paths[0]).read().splitlines()[-nv:]]
    np.testing.assert_allclose(vals, np.arange(nv))
