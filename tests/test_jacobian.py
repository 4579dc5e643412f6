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
