"""Threaded AOT pre-compilation of pipeline programs (VERDICT r3 item 3).

The serial execute-to-compile warmup pays the SUM of the pipeline's program
compile times; `ActiveSubspaceProjector.precompile_programs` /
`sampling.precompile_parallel` overlap the independent programs (coarse
warm-start chain, batched Newton, Jacobian materialization, randomized GHEP)
in threads, paying roughly the MAX.  These tests pin the two contracts that
make the optimization safe:

* building programs draws NO PRNG — results are bitwise identical with the
  pass enabled or disabled, warm-start chain or not;
* the AOT executables are shape-exact aliases of the jit path — a program
  precompiled from predicted shapes serves the real call.
"""

import jax
import numpy as np
import pytest

from hippyflow_tpu import config as hf_config
from hippyflow_tpu.fem.multigrid import coarse_newton_warm_start
from hippyflow_tpu.models.active_subspace import (
    ActiveSubspaceParameterList,
    ActiveSubspaceProjector,
)
from hippyflow_tpu.models.sampling import jit_lifted, precompile_parallel


@pytest.fixture
def _restore_knob():
    prev = hf_config.set_parallel_precompile(True)
    yield
    hf_config.set_parallel_precompile(prev)


def _confusion_projector(nx, n_samples, chunk, with_cws, rank=6):
    from applications.confusion import confusion_linear_observable, confusion_prior

    obs, Vh = confusion_linear_observable(nx=nx, velocity="analytic")
    prior = confusion_prior(Vh)
    params = ActiveSubspaceParameterList()
    params["rank"] = rank
    params["oversampling"] = 4
    params["samples_per_process"] = n_samples
    params["chunk_size"] = chunk
    if with_cws:
        obs_c, Vh_c = confusion_linear_observable(nx=nx // 2, velocity="analytic")
        params["coarse_warm_start"] = coarse_newton_warm_start(
            prior, obs_c.problem, Vh, Vh_c
        )
    return ActiveSubspaceProjector(obs, prior, parameters=params)


@pytest.mark.parametrize("with_cws", [False, True])
def test_precompile_bitwise_identical(_restore_knob, with_cws):
    """Same seeds, same samples, same subspace — with and without the
    parallel precompile pass (n % chunk != 0 exercises the tail-chunk
    program builders too)."""
    results = {}
    for enabled in (False, True):
        hf_config.set_parallel_precompile(enabled)
        proj = _confusion_projector(12, 6, 4, with_cws)
        if enabled:
            assert proj.precompile_programs() >= 3  # fwd(+tail)+jac+ghep
        d, dec, enc = proj.construct_input_subspace(prior_preconditioned=True)
        results[enabled] = (np.asarray(d), np.asarray(dec), np.asarray(enc))
    for a, b in zip(results[False], results[True]):
        np.testing.assert_array_equal(a, b)


def test_precompile_fused_symmetric(_restore_knob):
    """The linear-symmetric (helmholtz-style) fused pass precompiles and
    matches the non-precompiled run bitwise."""
    from applications.helmholtz import helmholtz_linear_observable, helmholtz_prior

    results = {}
    for enabled in (False, True):
        hf_config.set_parallel_precompile(enabled)
        obs, Vh = helmholtz_linear_observable(nx=10, frequency=300.0)
        prior = helmholtz_prior(Vh)
        params = ActiveSubspaceParameterList()
        params["rank"] = 4
        params["oversampling"] = 2
        params["samples_per_process"] = 5
        params["chunk_size"] = 3  # full (3) + tail (2) chunk programs
        proj = ActiveSubspaceProjector(obs, prior, parameters=params)
        assert proj._fused_symmetric_eligible()
        if enabled:
            assert proj.precompile_programs() == 3  # 2 fused chunks + ghep
        d, dec, enc = proj.construct_input_subspace(prior_preconditioned=True)
        results[enabled] = (np.asarray(d), np.asarray(dec))
    for a, b in zip(results[False], results[True]):
        np.testing.assert_array_equal(a, b)


def test_jit_lifted_precompile_alias():
    """precompile() then call must equal plain call (AOT path), and a
    second precompile is a no-op."""
    c = jax.numpy.arange(5.0)  # closure constant, lifted to an argument

    def f(x):
        return x * 2.0 + c

    x = jax.ShapeDtypeStruct((5,), c.dtype)
    lifted = jit_lifted(f, x)
    lifted.precompile()
    lifted.precompile()
    xv = jax.numpy.ones(5, dtype=c.dtype)
    np.testing.assert_array_equal(np.asarray(lifted(xv)), np.asarray(xv * 2 + c))


def test_precompile_parallel_failure_is_nonfatal():
    """A builder that raises must not take down the pass — the remaining
    programs still build, and the failed one compiles on first call."""

    built = []

    def good():
        def f(x):
            return x + 1.0

        lifted = jit_lifted(f, jax.ShapeDtypeStruct((3,), jax.numpy.float64))
        built.append(lifted)
        return lifted

    def bad():
        raise RuntimeError("transport dropped")

    precompile_parallel([bad, good, None])
    assert len(built) == 1
    out = built[0](jax.numpy.zeros(3))
    np.testing.assert_array_equal(np.asarray(out), np.ones(3))
