"""Application problems: confusion ADR and Helmholtz PML."""

import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from applications.confusion import (
    confusion_linear_observable,
    confusion_prior,
    confusion_velocity,
)
from applications.helmholtz import helmholtz_linear_observable, helmholtz_prior
from hippyflow_tpu.models import ObservableJacobian


class TestConfusion:
    @pytest.fixture(scope="class")
    def setup(self):
        obs, Vh = confusion_linear_observable(nx=12)
        prior = confusion_prior(Vh)
        return obs, Vh, prior

    def test_velocity_divergence_free_and_bcs(self, setup):
        obs, Vh, prior = setup
        v = confusion_velocity(Vh)
        x = Vh.dof_coords
        # tangential at walls: v.n = 0
        left = x[:, 0] < 1e-12
        assert np.abs(v[left, 0]).max() < 1e-12
        assert v[left, 1].max() > 0.5  # upward at left wall
        right = x[:, 0] > 1 - 1e-12
        assert v[right, 1].min() < -0.5  # downward at right wall
        # analytic divergence of the stream-function field is zero
        # div v = d/dx(-sin(pi x)cos(pi y)) + d/dy(cos(pi x) sin(pi y))
        #       = -pi cos cos + pi cos cos = 0 (exact)

    @pytest.mark.slow
    def test_forward_solve_and_jacobian(self, setup):
        obs, Vh, prior = setup
        m = prior.sample_n(jax.random.PRNGKey(0), 1)[0]
        u, info = obs.problem.solve_fwd(m)
        assert bool(info.converged)
        lin = obs.problem.linearize(u, m, None)
        J = ObservableJacobian(obs)
        dm = jax.random.normal(jax.random.PRNGKey(1), (obs.dM,))
        dq = jax.random.normal(jax.random.PRNGKey(2), (obs.dQ,))
        lhs = float(dq @ J.mult(lin, dm))
        rhs = float(J.transpmult(lin, dq) @ dm)
        assert abs(lhs - rhs) / abs(lhs) < 1e-11

    def test_batched_sampling(self, setup):
        obs, Vh, prior = setup
        from hippyflow_tpu.models import sample_until_solved
        from hippyflow_tpu.utils import KeyChain

        batch = sample_until_solved(obs, prior, KeyChain(0), 6, chunk_size=6)
        assert batch.qs.shape == (6, 100)
        assert np.isfinite(np.asarray(batch.qs)).all()


class TestHelmholtz:
    @pytest.fixture(scope="class")
    def setup(self):
        obs, Vh = helmholtz_linear_observable(nx=30, frequency=300)
        prior = helmholtz_prior(Vh)
        return obs, Vh, prior

    @pytest.mark.slow
    def test_pml_attenuation(self, setup):
        obs, Vh, prior = setup
        m = jnp.zeros(obs.dM)
        u, info = obs.problem.solve_fwd(m)
        Vu = obs.problem.Vu  # P2 state space
        n = Vu.dim
        u1 = np.asarray(u[:n])
        x = Vu.dof_coords
        outer = x[:, 0] < -0.9  # deep in the left PML
        inner = (np.abs(x[:, 0] - 0.8) < 0.3) & (np.abs(x[:, 1] - 2.8) < 0.3)
        assert np.abs(u1[outer]).max() < 0.05 * np.abs(u1[inner]).max()

    @pytest.mark.slow
    def test_jacobian_consistency(self, setup):
        obs, Vh, prior = setup
        m = prior.sample_n(jax.random.PRNGKey(0), 1)[0]
        lin = obs.linearize(m)
        J = ObservableJacobian(obs)
        dm = jax.random.normal(jax.random.PRNGKey(1), (obs.dM,))
        eps = 1e-6
        fd = (obs.eval(m + eps * dm) - obs.eval(m - eps * dm)) / (2 * eps)
        an = J.mult(lin, dm)
        assert float(jnp.linalg.norm(fd - an) / jnp.linalg.norm(an)) < 1e-7
        Jd = J.materialize(lin)
        assert Jd.shape == (obs.dQ, obs.dM)
        np.testing.assert_allclose(
            np.asarray(Jd @ dm), np.asarray(an), rtol=1e-9, atol=1e-12
        )

    @pytest.mark.slow
    def test_active_subspace_runs(self, setup):
        obs, Vh, prior = setup
        from hippyflow_tpu.models import (
            ActiveSubspaceParameterList,
            ActiveSubspaceProjector,
        )

        params = ActiveSubspaceParameterList()
        params["rank"] = 8
        params["oversampling"] = 4
        params["samples_per_process"] = 4
        params["verbose"] = False
        proj = ActiveSubspaceProjector(obs, prior, parameters=params)
        d, dec, enc = proj.construct_input_subspace()
        assert d.shape == (8,)
        assert bool((np.asarray(d) > 0).all())
        assert bool((np.diff(np.asarray(d)) <= 1e-12).all())


class TestNavierStokes:
    def test_cavity_circulation(self):
        from applications.navier_stokes import steady_navier_stokes
        from hippyflow_tpu.fem import FunctionSpace, unit_square_mesh

        V = FunctionSpace(unit_square_mesh(12))
        v, p, info = steady_navier_stokes(V, Re=100.0)
        assert bool(info.converged)
        x = V.dof_coords
        left = x[:, 0] < 1e-12
        np.testing.assert_allclose(np.asarray(v[left, 1]), 1.0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(v[left, 0]), 0.0, atol=1e-10)
        # interior circulation antisymmetric about x = 1/2
        mid = np.abs(x[:, 1] - 0.5) < 0.05
        lh = mid & (x[:, 0] > 0.1) & (x[:, 0] < 0.45)
        rh = mid & (x[:, 0] > 0.55) & (x[:, 0] < 0.9)
        assert float(np.asarray(v[lh, 1]).mean()) > 0.05
        assert float(np.asarray(v[rh, 1]).mean()) < -0.05

    def test_confusion_with_ns_velocity(self):
        from applications.confusion import confusion_linear_observable, confusion_prior

        obs, Vh = confusion_linear_observable(nx=10, velocity="navier_stokes")
        prior = confusion_prior(Vh)
        u, info = obs.problem.solve_fwd(prior.mean)
        assert bool(info.converged)
