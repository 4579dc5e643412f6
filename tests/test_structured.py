"""Block-tridiagonal structured solver vs dense factorization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hippyflow_tpu as hf
from hippyflow_tpu.ops import factorize, factorize_block_tridiag_dense


def _assembled_operator(nx=12, symmetric=True):
    mesh = hf.unit_square_mesh(nx)
    V = hf.FunctionSpace(mesh)
    if symmetric:
        A = hf.stiffness_matrix(V) + 2.0 * hf.mass_matrix(V)
    else:
        # add a skew advection-like perturbation preserving the sparsity
        K = hf.stiffness_matrix(V)
        M = hf.mass_matrix(V)
        A = K + 2.0 * M + 0.3 * (jnp.triu(K) - jnp.tril(K))
    return V, A


@pytest.mark.parametrize("symmetric", [True, False])
def test_block_tridiag_matches_dense(symmetric):
    V, A = _assembled_operator(12, symmetric)
    s = V.mesh.structured_shape[0] + 1
    fac_bt = factorize_block_tridiag_dense(A, s)
    fac_dense = factorize(A, symmetric=False)
    b = jax.random.normal(jax.random.PRNGKey(0), (V.dim, 3))
    np.testing.assert_allclose(
        np.asarray(fac_bt.solve(b)), np.asarray(fac_dense.solve(b)), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(fac_bt.solve(b, trans=True)),
        np.asarray(fac_dense.solve(b, trans=True)),
        rtol=1e-9,
    )
    # single-vector path
    np.testing.assert_allclose(
        np.asarray(fac_bt.solve(b[:, 0])),
        np.asarray(fac_dense.solve(b[:, 0])),
        rtol=1e-9,
    )


def test_block_tridiag_vmap():
    V, A = _assembled_operator(8, True)
    s = V.mesh.structured_shape[0] + 1
    A_batch = jnp.stack([A, A * 1.5, A + 0.1 * hf.mass_matrix(V)])
    facs = jax.vmap(lambda a: factorize_block_tridiag_dense(a, s))(A_batch)
    b = jax.random.normal(jax.random.PRNGKey(1), (V.dim,))
    xs = jax.vmap(lambda f: f.solve(b))(facs)
    for i, Ai in enumerate(A_batch):
        np.testing.assert_allclose(
            np.asarray(Ai @ xs[i]), np.asarray(b), atol=1e-9
        )


def test_problem_uses_block_tridiag_and_matches_dense_solver():
    """Same Poisson problem solved with both solver paths: identical."""
    from hippyflow_tpu.testing import (
        poisson_control_settings,
        setup_poisson_control_problem,
        make_poisson_varf,
    )

    settings = poisson_control_settings()
    settings["nx"] = settings["ny"] = 10
    pde_auto, prior, control_dist, Vh = setup_poisson_control_problem(settings)
    assert pde_auto._use_block_tridiag

    import hippyflow_tpu as hf

    pde_dense = hf.VariationalPDEProblem(
        Vh,
        Vh,
        make_poisson_varf(settings),
        pde_auto.bc,
        is_fwd_linear=True,
        control_dim=25,
        solver="dense",
    )
    assert not pde_dense._use_block_tridiag
    m = prior.sample_n(jax.random.PRNGKey(0), 1)[0]
    z = control_dist.sample_n(jax.random.PRNGKey(1), 1)[0]
    u1, _ = pde_auto.solve_fwd(m, z=z)
    u2, _ = pde_dense.solve_fwd(m, z=z)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-10)

    # Jacobian actions agree too (incremental fwd/adj through the factor)
    from hippyflow_tpu.models import LinearStateObservable, ObservableJacobian
    from hippyflow_tpu.testing import poisson_pointwise_observable

    obs1 = poisson_pointwise_observable(pde_auto, Vh, n_obs=6)
    obs2 = poisson_pointwise_observable(pde_dense, Vh, n_obs=6)
    lin1 = obs1.linearize(m, z=z)
    lin2 = obs2.linearize(m, z=z)
    dm = jax.random.normal(jax.random.PRNGKey(2), (Vh.dim,))
    J1 = ObservableJacobian(obs1).mult(lin1, dm)
    J2 = ObservableJacobian(obs2).mult(lin2, dm)
    np.testing.assert_allclose(np.asarray(J1), np.asarray(J2), atol=1e-10)


def test_prior_block_tridiag_consistency():
    """Structured-mesh prior (block-Thomas K solves) matches the dense-path
    algebra: R Rsolver = I and sampling covariance exact."""
    V = hf.FunctionSpace(hf.unit_square_mesh(10))
    prior = hf.BiLaplacianPrior(V, gamma=0.2, delta=2.0)
    from hippyflow_tpu.ops import BlockTridiagFactor

    assert isinstance(prior._K_chol, BlockTridiagFactor)
    X = jax.random.normal(jax.random.PRNGKey(0), (V.dim, 4))
    err = jnp.linalg.norm(prior.R_matmat(prior.Rsolver_matmat(X)) - X)
    assert float(err / jnp.linalg.norm(X)) < 1e-9
