"""Jacobian correctness: adjoint consistency, finite differences,
materialization, control Jacobian."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hippyflow_tpu.models import (
    ObservableControlJacobian,
    ObservableJacobian,
)
from hippyflow_tpu.testing import (
    poisson_control_settings,
    poisson_pointwise_observable,
    setup_poisson_control_problem,
)


@pytest.fixture(scope="module", params=[True, False], ids=["linear", "nonlinear"])
def setup(request):
    settings = poisson_control_settings()
    settings["nx"] = settings["ny"] = 10
    settings["LINEAR"] = request.param
    pde, prior, control_dist, Vh = setup_poisson_control_problem(settings)
    obs = poisson_pointwise_observable(pde, Vh, n_obs=7)
    key = jax.random.PRNGKey(0)
    m = prior.sample_n(key, 1)[0]
    z = control_dist.sample_n(jax.random.PRNGKey(1), 1)[0]
    lin = obs.linearize(m, z=z)
    return obs, prior, m, z, lin


def test_adjoint_dot_test(setup):
    obs, prior, m, z, lin = setup
    J = ObservableJacobian(obs)
    dm = jax.random.normal(jax.random.PRNGKey(2), (obs.dM,))
    dq = jax.random.normal(jax.random.PRNGKey(3), (obs.dQ,))
    lhs = float(dq @ J.mult(lin, dm))
    rhs = float(J.transpmult(lin, dq) @ dm)
    assert abs(lhs - rhs) / abs(lhs) < 1e-12


def test_jacobian_finite_difference(setup):
    obs, prior, m, z, lin = setup
    J = ObservableJacobian(obs)
    dm = jax.random.normal(jax.random.PRNGKey(4), (obs.dM,))
    eps = 1e-6
    qp = obs.eval(m + eps * dm, z=z, u0=lin.u)
    qm = obs.eval(m - eps * dm, z=z, u0=lin.u)
    fd = (qp - qm) / (2 * eps)
    an = J.mult(lin, dm)
    assert float(jnp.linalg.norm(fd - an) / jnp.linalg.norm(an)) < 1e-7


def test_materialize_matches_action(setup):
    obs, prior, m, z, lin = setup
    J = ObservableJacobian(obs)
    Jd = J.materialize(lin)
    assert Jd.shape == (obs.dQ, obs.dM)
    dm = jax.random.normal(jax.random.PRNGKey(5), (obs.dM, 3))
    np.testing.assert_allclose(
        np.asarray(Jd @ dm), np.asarray(J.mult(lin, dm)), rtol=1e-10, atol=1e-12
    )
    dq = jax.random.normal(jax.random.PRNGKey(6), (obs.dQ, 3))
    np.testing.assert_allclose(
        np.asarray(Jd.T @ dq),
        np.asarray(J.transpmult(lin, dq)),
        rtol=1e-10,
        atol=1e-12,
    )


def test_control_jacobian(setup):
    obs, prior, m, z, lin = setup
    Jz = ObservableControlJacobian(obs)
    dz = jax.random.normal(jax.random.PRNGKey(7), (z.shape[0],))
    dq = jax.random.normal(jax.random.PRNGKey(8), (obs.dQ,))
    lhs = float(dq @ Jz.mult(lin, dz))
    rhs = float(Jz.transpmult(lin, dq) @ dz)
    assert abs(lhs - rhs) / abs(lhs) < 1e-12
    # FD check
    eps = 1e-6
    qp = obs.eval(m, z=z + eps * dz, u0=lin.u)
    qm = obs.eval(m, z=z - eps * dz, u0=lin.u)
    fd = (qp - qm) / (2 * eps)
    an = Jz.mult(lin, dz)
    assert float(jnp.linalg.norm(fd - an) / jnp.linalg.norm(an)) < 1e-7
    # materialization
    Jzd = Jz.materialize(lin)
    np.testing.assert_allclose(
        np.asarray(Jzd @ dz), np.asarray(an), rtol=1e-10, atol=1e-12
    )


def test_parameter_projection_restricts_sensitivity():
    """LinearStateObservable(parameter_projection=indicator): C dm only sees
    the restricted parameter subdomain (reference `observable.py:263-297`)."""
    import numpy as np
    import jax.numpy as jnp

    from hippyflow_tpu.fem import (
        DirichletBC,
        FunctionSpace,
        GalerkinForm,
        unit_square_mesh,
    )
    from hippyflow_tpu.models import (
        LinearStateObservable,
        PointwiseObservation,
        VariationalPDEProblem,
    )

    V = FunctionSpace(unit_square_mesh(8))
    bc = DirichletBC.from_predicate(V, None, 0.0)
    form = GalerkinForm(
        flux=lambda x, u, gu, m, z, c: jnp.exp(m) * gu,
        source=lambda x, u, gu, m, z, c: -1.0,
    )
    pde = VariationalPDEProblem(V, V, form, bc, is_fwd_linear=True)
    x = V.dof_coords
    indicator = (x[:, 0] < 0.5).astype(float)
    B = PointwiseObservation(V, np.array([[0.3, 0.3], [0.7, 0.7]]))
    obs = LinearStateObservable(pde, B, parameter_projection=indicator)
    obs_full = LinearStateObservable(pde, B)

    m = jnp.zeros(V.dim)
    lin = obs.linearize(m)
    rng = np.random.RandomState(0)
    dm = jnp.asarray(rng.randn(V.dim))
    # C applied to a perturbation supported outside the subdomain vanishes
    dm_outside = jnp.where(jnp.asarray(indicator) > 0, 0.0, dm)
    assert float(jnp.abs(obs.applyC(lin, dm_outside)).max()) < 1e-13
    # and matches the unrestricted C on masked perturbations
    dm_inside = jnp.where(jnp.asarray(indicator) > 0, dm, 0.0)
    np.testing.assert_allclose(
        np.asarray(obs.applyC(lin, dm)),
        np.asarray(obs_full.applyC(lin, dm_inside)),
        atol=1e-13,
    )
    # transpose consistency: <C dm, dp> == <dm, C^T dp>
    dp = jnp.asarray(rng.randn(V.dim))
    lhs = float(obs.applyC(lin, dm) @ dp)
    rhs = float(dm @ obs.applyCt(lin, dp))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_materialize_chunked_matches_single(setup):
    """Chunked materialization (donated slice-update accumulation) is
    bitwise-identical to the single-chunk path.  The accumulation replaced
    an n-way concatenate whose XLA layout padded the chunk axis 8->128 (a
    measured 16x HBM blowup at nx=192 rank 128; see
    models/sampling.py::materialize_jacobians)."""
    from hippyflow_tpu.models import materialize_jacobians

    obs, prior, m, z, lin = setup
    key = jax.random.PRNGKey(11)
    ms = prior.sample_n(key, 5)
    us = []
    for i in range(5):
        us.append(obs.linearize(ms[i], z=z).u)
    us = jnp.stack(us)
    zs = jnp.broadcast_to(z, (5, z.shape[0]))
    J_single = materialize_jacobians(obs, ms, us, zs, chunk_size=5)
    J_chunked = materialize_jacobians(obs, ms, us, zs, chunk_size=2)
    np.testing.assert_array_equal(np.asarray(J_single), np.asarray(J_chunked))
