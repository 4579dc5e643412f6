"""ModelWrapper (inverse-problem layer) tests: gradient consistency by
finite differences, GN Hessian symmetry, synthetic-data setup."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hippyflow_tpu.models import ModelWrapper, PointwiseMisfit
from hippyflow_tpu.testing import (
    poisson_control_settings,
    poisson_pointwise_observable,
    setup_poisson_control_problem,
)


@pytest.fixture(scope="module")
def wrapper():
    settings = poisson_control_settings()
    settings["nx"] = settings["ny"] = 10
    # no control for the inverse-problem wrapper: fix z inside the form
    pde, prior, control_dist, Vh = setup_poisson_control_problem(settings)
    # freeze control at a fixed value by wrapping solve in an observable with
    # z bound: easiest is a problem without control — rebuild via closure
    import hippyflow_tpu as hf
    from hippyflow_tpu.testing import make_poisson_varf

    z_fixed = jnp.asarray(np.linspace(-1, 1, 25))
    base_form = make_poisson_varf(settings)

    def flux(x, u, gu, m, z, c):
        return base_form.flux(x, u, gu, m, z_fixed, c)

    def source(x, u, gu, m, z, c):
        return base_form.source(x, u, gu, m, z_fixed, c)

    form = hf.GalerkinForm(flux=flux, source=source, quad_degree=4, symmetric=True)
    bc = hf.DirichletBC.from_predicate(Vh, lambda x: (x[:, 1] < 1e-12) | (x[:, 1] > 1 - 1e-12), lambda x: x[:, 1])
    pde2 = hf.VariationalPDEProblem(Vh, Vh, form, bc, is_fwd_linear=True)
    obs = poisson_pointwise_observable(pde2, Vh, n_obs=12)
    w = ModelWrapper(obs, prior)
    w.settings["rel_noise"] = 0.01
    w.setUpInverseProblem()
    return w


def test_misfit_setup(wrapper):
    assert wrapper.misfit is not None
    assert wrapper.misfit.d.shape == (12,)
    assert wrapper.misfit.noise_variance > 0
    # misfit at the true parameter is small (only noise)
    cost_true = float(wrapper.evalMisfitCost(wrapper.mtrue))
    m_other = wrapper.samplePrior(1)[0]
    cost_other = float(wrapper.evalMisfitCost(m_other))
    assert cost_true < cost_other


def test_gradient_finite_difference(wrapper):
    m = wrapper.samplePrior(1)[0]
    g = wrapper.evalVariationalGradient(m, misfit_only=False)
    dm = jax.random.normal(jax.random.PRNGKey(0), m.shape)
    eps = 1e-6
    cp = float(wrapper.evalCost(m + eps * dm))
    cm = float(wrapper.evalCost(m - eps * dm))
    fd = (cp - cm) / (2 * eps)
    an = float(jnp.dot(g, dm))
    assert abs(fd - an) / abs(an) < 1e-6


def test_gn_hessian_spd(wrapper):
    m = wrapper.samplePrior(1)[0]
    lin = wrapper.observable.linearize(m)
    v = jax.random.normal(jax.random.PRNGKey(1), m.shape)
    w_vec = jax.random.normal(jax.random.PRNGKey(2), m.shape)
    Hv = wrapper.evalGNHessian(v, lin=lin)
    Hw = wrapper.evalGNHessian(w_vec, lin=lin)
    # symmetry
    assert abs(float(w_vec @ Hv - v @ Hw)) < 1e-10 * abs(float(v @ Hv))
    # positive semidefinite
    assert float(v @ Hv) >= 0


@pytest.mark.slow
def test_low_rank_jacobian(wrapper):
    m = wrapper.samplePrior(1)[0]
    lin = wrapper.observable.linearize(m)
    U, s, V = wrapper.evalLowRankJacobian(5, lin=lin)
    Jd = wrapper.evalJacobian(lin=lin)
    # best rank-5 approximation error equals sigma_6
    err = jnp.linalg.norm(Jd - U * s[None, :] @ V.T, ord=2)
    s_all = jnp.linalg.svd(Jd, compute_uv=False)
    assert abs(float(err) - float(s_all[5])) < 1e-10
