"""Grid-sequenced Newton warm starts (fem/multigrid.py).

The reference always cold-starts its per-sample dolfin NewtonSolver
(`hippyflow/modeling/activeSubspaceProjector.py:205-214`); grid sequencing
is a TPU-native throughput optimization of the same sampling map, so the
tests check the framework invariants it must preserve: exact P1 transfer
operators, iteration reduction at identical solutions, and the bit-exact
determinism the chunk-resumable drivers rely on
(tests/test_resume_health.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from applications.confusion import confusion_linear_observable, confusion_prior
from hippyflow_tpu.fem import (
    FunctionSpace,
    coarse_newton_warm_start,
    prolong_linear,
    restrict_injection,
    unit_square_mesh,
)
from hippyflow_tpu.models.sampling import sample_until_solved
from hippyflow_tpu.utils import KeyChain


def _spaces(nf=8):
    Vf = FunctionSpace(unit_square_mesh(nf))
    Vc = FunctionSpace(unit_square_mesh(nf // 2))
    return Vf, Vc


def test_prolong_exact_on_linear_fields():
    """P1 2:1 interpolation reproduces affine fields exactly."""
    Vf, Vc = _spaces(8)
    xc, xf = Vc.dof_coords, Vf.dof_coords
    lin_c = 2.0 * xc[:, 0] - 0.5 * xc[:, 1] + 1.0
    lin_f = 2.0 * xf[:, 0] - 0.5 * xf[:, 1] + 1.0
    np.testing.assert_allclose(
        np.asarray(prolong_linear(jnp.asarray(lin_c), Vc, Vf)), lin_f, atol=1e-14
    )


def test_restrict_prolong_roundtrip_multicomponent():
    """Injection restriction is a left inverse of prolongation; trailing
    component axes ((n, k) dof arrays) pass through both transfers."""
    Vf, Vc = _spaces(8)
    rng = np.random.default_rng(0)
    xc = rng.standard_normal((Vc.dim, 3))
    up = prolong_linear(jnp.asarray(xc), Vc, Vf)
    assert up.shape == (Vf.dim, 3)
    np.testing.assert_allclose(
        np.asarray(restrict_injection(up, Vf, Vc)), xc, atol=1e-15
    )


def _setup(nx=16):
    obs, Vf = confusion_linear_observable(nx=nx, velocity="analytic")
    obs_c, Vc = confusion_linear_observable(nx=nx // 2, velocity="analytic")
    prior = confusion_prior(Vf)
    cws = coarse_newton_warm_start(prior, obs_c.problem, Vf, Vc)
    return obs, prior, cws


def test_warm_start_cuts_iterations_at_same_solution():
    obs, prior, cws = _setup()
    noise = KeyChain(3).normal((8, prior.noise_dim))
    ms = jax.vmap(prior.sample)(noise)
    u0 = cws(noise)
    assert bool(jnp.all(jnp.isfinite(u0)))
    solve = jax.jit(jax.vmap(lambda m, u: obs.problem.solve_fwd(m, u0=u)))
    u_cold, info_cold = solve(ms, jnp.zeros_like(u0))
    u_warm, info_warm = solve(ms, u0)
    assert bool(info_cold.converged.all()) and bool(info_warm.converged.all())
    # grid sequencing must help: no lane regresses, total work drops
    assert int(info_warm.iterations.max()) <= int(info_cold.iterations.max())
    assert int(info_warm.iterations.sum()) < int(info_cold.iterations.sum())
    # and both starts land on the same Newton root
    np.testing.assert_allclose(
        np.asarray(u_warm), np.asarray(u_cold), atol=1e-5
    )


def test_sample_until_solved_gridseq_bitexact_and_stream_preserving():
    """The warm start consumes no PRNG keys and is a pure function of each
    lane's noise, so (a) repeated runs are bitwise identical (the resume
    guarantee) and (b) the (m, q) stream matches a cold-start run."""
    obs, prior, cws = _setup()
    kw = dict(n_samples=12, chunk_size=4)
    b1 = sample_until_solved(obs, prior, KeyChain(11), coarse_warm_start=cws, **kw)
    b2 = sample_until_solved(obs, prior, KeyChain(11), coarse_warm_start=cws, **kw)
    np.testing.assert_array_equal(np.asarray(b1.us), np.asarray(b2.us))
    np.testing.assert_array_equal(np.asarray(b1.qs), np.asarray(b2.qs))
    b0 = sample_until_solved(
        obs, prior, KeyChain(11), reset_initial_guess=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(b1.ms), np.asarray(b0.ms))
    np.testing.assert_allclose(
        np.asarray(b1.us), np.asarray(b0.us), atol=1e-5
    )


def test_recursive_chain_matches_two_grid():
    """coarser_levels (full nested iteration) must produce a warm start of
    the same quality as the 2-grid map — identical fine solutions, no lane
    regressing past the 2-grid iteration count — while consuming no PRNG
    keys (same determinism contract)."""
    nx = 16
    obs, Vf = confusion_linear_observable(nx=nx, velocity="analytic")
    obs_c, Vc = confusion_linear_observable(nx=nx // 2, velocity="analytic")
    obs_cc, Vcc = confusion_linear_observable(nx=nx // 4, velocity="analytic")
    prior = confusion_prior(Vf)
    cws2 = coarse_newton_warm_start(prior, obs_c.problem, Vf, Vc)
    cws3 = coarse_newton_warm_start(
        prior, obs_c.problem, Vf, Vc,
        coarser_levels=[(obs_cc.problem, Vcc)],
    )
    noise = KeyChain(5).normal((6, prior.noise_dim))
    ms = jax.vmap(prior.sample)(noise)
    u0_2, u0_3 = cws2(noise), cws3(noise)
    assert bool(jnp.all(jnp.isfinite(u0_3)))
    # both chains land on the same coarse Newton root -> near-equal u0
    np.testing.assert_allclose(
        np.asarray(u0_3), np.asarray(u0_2), atol=1e-5
    )
    solve = jax.jit(jax.vmap(lambda m, u: obs.problem.solve_fwd(m, u0=u)))
    u2, info2 = solve(ms, u0_2)
    u3, info3 = solve(ms, u0_3)
    assert bool(info2.converged.all()) and bool(info3.converged.all())
    assert int(info3.iterations.max()) <= int(info2.iterations.max())
    np.testing.assert_allclose(np.asarray(u3), np.asarray(u2), atol=1e-5)
    # determinism: re-evaluating the 3-grid map is bitwise identical
    np.testing.assert_array_equal(np.asarray(cws3(noise)), np.asarray(u0_3))


def test_split_chain_matches_monolithic():
    """split=True (per-level XLA programs, SplitWarmStartChain) computes
    the same warm start as the single-program chain, is deterministic, and
    composes with sample_until_solved's builders/precompile path."""
    nx = 16
    obs, Vf = confusion_linear_observable(nx=nx, velocity="analytic")
    obs_c, Vc = confusion_linear_observable(nx=nx // 2, velocity="analytic")
    obs_cc, Vcc = confusion_linear_observable(nx=nx // 4, velocity="analytic")
    prior = confusion_prior(Vf)
    kw = dict(coarser_levels=[(obs_cc.problem, Vcc)])
    cws_mono = coarse_newton_warm_start(prior, obs_c.problem, Vf, Vc, **kw)
    cws_split = coarse_newton_warm_start(
        prior, obs_c.problem, Vf, Vc, split=True, **kw
    )
    noise = KeyChain(5).normal((6, prior.noise_dim))
    u0_m = np.asarray(cws_mono(noise))
    u0_s = np.asarray(cws_split(noise))
    # same per-level solves/transfers, only program boundaries differ
    np.testing.assert_allclose(u0_s, u0_m, rtol=0, atol=1e-12)
    # deterministic re-evaluation (resume guarantee)
    np.testing.assert_array_equal(np.asarray(cws_split(noise)), u0_s)
    # builders: 1 restrict + depth level programs, all precompilable
    blds = cws_split.builders(6, noise.dtype)
    assert len(blds) == 3
    for b in blds:
        f = b()
        assert hasattr(f, "precompile")
    # end-to-end through sample_until_solved (same stream as monolithic)
    b_s = sample_until_solved(
        obs, prior, KeyChain(11), n_samples=8, chunk_size=4,
        coarse_warm_start=cws_split,
    )
    b_m = sample_until_solved(
        obs, prior, KeyChain(11), n_samples=8, chunk_size=4,
        coarse_warm_start=cws_mono,
    )
    np.testing.assert_array_equal(np.asarray(b_s.ms), np.asarray(b_m.ms))
    np.testing.assert_allclose(
        np.asarray(b_s.us), np.asarray(b_m.us), atol=1e-6
    )
