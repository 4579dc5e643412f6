"""Fused forward+Jacobian sampling for symmetric linear operators.

The helmholtz split-complex form assembles to A^T = A (indefinite), so one
adjoint-only factorization per sample serves both the forward solve and the
dQ-rhs Jacobian materialization (`sampling.sample_and_materialize_symmetric`,
reference analog: per-sample LU reuse in `hippyflow/modeling/jacobian.py:
117-139`).  These tests pin the algebraic fact and the fused/staged
equivalence the bench lane relies on.
"""

import jax
import jax.numpy as jnp
import numpy as np

from applications.helmholtz import helmholtz_linear_observable, helmholtz_prior
from hippyflow_tpu.models import ActiveSubspaceProjector
from hippyflow_tpu.models.sampling import (
    materialize_jacobians,
    sample_and_materialize_symmetric,
    sample_until_solved,
)
from hippyflow_tpu.utils import KeyChain


def _setup(nx=12, frequency=150.0):
    obs, Vh = helmholtz_linear_observable(nx=nx, frequency=frequency)
    return obs, helmholtz_prior(Vh)


def test_split_operator_is_symmetric():
    """A^T = A for the assembled split-complex PML operator — the property
    the fused pass rests on (checked matrix-free via jvp/vjp agreement)."""
    obs, prior = _setup(nx=8)
    problem = obs.problem
    m = jax.vmap(prior.sample)(KeyChain(0).normal((1, prior.noise_dim)))[0]
    zero = jnp.zeros(problem.state_dim, dtype=m.dtype)
    r = lambda u: problem.residual_masked(u, m, None)
    key2 = jax.random.PRNGKey(1)
    y = jax.random.normal(key2, (problem.state_dim,), dtype=m.dtype)
    _, pull = jax.vjp(r, zero)
    Aty = pull(y)[0]  # A^T y (the jvp tangent is exactly A y: r is affine)
    Ay = jax.jvp(r, (zero,), (y,))[1]
    np.testing.assert_allclose(
        np.asarray(Aty), np.asarray(Ay), rtol=1e-10, atol=1e-12
    )


def test_fused_matches_staged_pipeline():
    """Same keychain -> bitwise-identical parameters; fused u/q/J match the
    staged solve_fwd + linearize('adj') path to solver tolerance."""
    obs, prior = _setup()
    batch_f, Js_f = sample_and_materialize_symmetric(
        obs, prior, KeyChain(7), 6, chunk_size=3
    )
    assert batch_f.n_failures == 0
    batch_s = sample_until_solved(obs, prior, KeyChain(7), 6, chunk_size=3)
    np.testing.assert_array_equal(
        np.asarray(batch_f.ms), np.asarray(batch_s.ms)
    )
    scale = float(jnp.abs(batch_s.us).max())
    np.testing.assert_allclose(
        np.asarray(batch_f.us), np.asarray(batch_s.us),
        atol=1e-8 * scale,
    )
    Js_s = materialize_jacobians(obs, batch_s.ms, batch_s.us, chunk_size=3)
    np.testing.assert_allclose(
        np.asarray(Js_f), np.asarray(Js_s),
        atol=1e-8 * float(jnp.abs(Js_s).max()),
    )


def test_as_projector_takes_fused_path():
    """construct_input_subspace on the symmetric linear problem produces
    the same spectrum whether the fused pass is enabled (default) or
    disabled (operator_symmetric=False), and actually uses it (samples and
    Js are set together)."""
    ds = {}
    for tag, sym in (("fused", True), ("staged", False)):
        obs, prior = _setup()
        if not sym:
            obs.problem.operator_symmetric = False
        proj = ActiveSubspaceProjector(obs, prior)
        proj.parameters["rank"] = 5
        proj.parameters["oversampling"] = 4
        proj.parameters["samples_per_process"] = 6
        proj.parameters["verbose"] = False
        ds[tag] = np.asarray(proj.construct_input_subspace()[0])
        if sym:
            assert proj.samples is not None and proj.Js is not None
    np.testing.assert_allclose(
        ds["fused"], ds["staged"], rtol=1e-7, atol=1e-12 * ds["staged"][0]
    )
