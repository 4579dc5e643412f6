"""Cross-implementation consistency of the active subspace construction —
port of `hippyflow/test/test_derivativeSubspace.py` and
`test_fullStateOperator.py`.

The materialized-Jacobian path (batched matmuls) and the matrix-free
'serialized' path (incremental solves inside the operator) must produce
identical spectra for shared samples and a shared random probe, to 1e-11
(the reference asserts 1e-12 between its batched/serialized variants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hippyflow_tpu.models import (
    ActiveSubspaceParameterList,
    ActiveSubspaceProjector,
)
from hippyflow_tpu.testing import (
    poisson_control_settings,
    poisson_full_state_observable,
    poisson_pointwise_observable,
    setup_poisson_control_problem,
)


def _make_projector(observable, prior, control_dist, serialized: bool):
    params = ActiveSubspaceParameterList()
    params["rank"] = 12
    params["oversampling"] = 6
    params["samples_per_process"] = 8
    params["serialized_sampling"] = serialized
    params["store_Omega"] = True
    params["ms_given"] = True
    params["verbose"] = False
    return ActiveSubspaceProjector(
        observable, prior, control_distribution=control_dist, parameters=params
    )


@pytest.fixture(scope="module")
def problem():
    settings = poisson_control_settings()
    settings["nx"] = settings["ny"] = 10
    pde, prior, control_dist, Vh = setup_poisson_control_problem(settings)
    key = jax.random.PRNGKey(0)
    ms = prior.sample_n(key, 8)
    zs = control_dist.sample_n(jax.random.PRNGKey(1), 8)
    return pde, prior, control_dist, Vh, ms, zs


def test_batched_vs_serialized_input_subspace(problem):
    pde, prior, control_dist, Vh, ms, zs = problem
    obs = poisson_pointwise_observable(pde, Vh, n_obs=15)

    proj_a = _make_projector(obs, prior, control_dist, serialized=False)
    proj_a.ms, proj_a.zs = ms, zs
    d_a, dec_a, enc_a = proj_a.construct_input_subspace()

    proj_b = _make_projector(obs, prior, control_dist, serialized=True)
    proj_b.ms, proj_b.zs = ms, zs
    proj_b.Omega_GN = proj_a.Omega_GN  # shared probe
    d_b, dec_b, enc_b = proj_b.construct_input_subspace()

    assert float(jnp.linalg.norm(d_a - d_b)) < 1e-11
    assert float(jnp.abs(dec_a - dec_b).max()) < 1e-9
    # encoder/decoder bi-orthogonality (R-orthonormal basis)
    r = d_a.shape[0]
    orth = jnp.abs(enc_a.T @ dec_a - jnp.eye(r)).max()
    assert float(orth) < 1e-8


@pytest.mark.slow
def test_batched_vs_serialized_output_subspace(problem):
    pde, prior, control_dist, Vh, ms, zs = problem
    obs = poisson_pointwise_observable(pde, Vh, n_obs=15)

    proj_a = _make_projector(obs, prior, control_dist, serialized=False)
    proj_a.ms, proj_a.zs = ms, zs
    d_a, dec_a, _ = proj_a.construct_output_subspace()

    proj_b = _make_projector(obs, prior, control_dist, serialized=True)
    proj_b.ms, proj_b.zs = ms, zs
    proj_b.Omega_NG = proj_a.Omega_NG
    d_b, dec_b, _ = proj_b.construct_output_subspace()

    assert float(jnp.linalg.norm(d_a - d_b)) < 1e-11
    assert float(jnp.abs(dec_a.T @ dec_a - jnp.eye(d_a.shape[0])).max()) < 1e-10


@pytest.mark.slow
def test_full_state_observable_consistency(problem):
    """Full-state B (mass-matrix transpose) — `test_fullStateOperator.py`."""
    pde, prior, control_dist, Vh, ms, zs = problem
    obs = poisson_full_state_observable(pde, Vh, use_mass_matrix=True)

    proj_a = _make_projector(obs, prior, control_dist, serialized=False)
    proj_a.ms, proj_a.zs = ms, zs
    d_a, _, _ = proj_a.construct_input_subspace()

    proj_b = _make_projector(obs, prior, control_dist, serialized=True)
    proj_b.ms, proj_b.zs = ms, zs
    proj_b.Omega_GN = proj_a.Omega_GN
    d_b, _, _ = proj_b.construct_input_subspace()

    assert float(jnp.linalg.norm(d_a - d_b) / jnp.linalg.norm(d_a)) < 1e-11


def test_gn_eigenvalues_match_dense_reference(problem):
    """The randomized GHEP at full oversampling must reproduce the exact
    dense GHEP of E[J^T J] against R — the eigenvalue-parity criterion of
    BASELINE.json (1e-8 relative)."""
    from hippyflow_tpu.models import materialize_jacobians
    from hippyflow_tpu.ops import generalized_eigh

    pde, prior, control_dist, Vh, ms, zs = problem
    obs = poisson_pointwise_observable(pde, Vh, n_obs=15)
    proj = _make_projector(obs, prior, control_dist, serialized=False)
    # probe block spanning the whole parameter space: the two-pass GHEP is
    # then exact, so this checks the algebra, not randomized-approximation
    # error (E[J^T J] over 8 rank-15 Jacobians has rank ~120 = dim here).
    proj.parameters["rank"] = 20
    proj.parameters["oversampling"] = Vh.dim - 20
    proj.ms, proj.zs = ms, zs
    d, dec, enc = proj.construct_input_subspace()

    # dense reference computation
    proj._ensure_samples()
    Js = materialize_jacobians(obs, proj.samples.ms, proj.samples.us, proj.samples.zs)
    H = np.mean([np.asarray(J).T @ np.asarray(J) for J in Js], axis=0)
    R = np.asarray(prior.R_matmat(jnp.eye(Vh.dim)))
    d_exact, _ = generalized_eigh(jnp.asarray(H), jnp.asarray(R))
    # J has rank <= dQ=15 per sample; compare the dominant eigenvalues
    k = 8
    rel = np.abs(np.asarray(d[:k]) - np.asarray(d_exact[:k])) / np.asarray(
        d_exact[0]
    )
    assert rel.max() < 1e-8


@pytest.mark.slow
def test_error_decay_and_jacobian_data(problem, tmp_path):
    pde, prior, control_dist, Vh, ms, zs = problem
    obs = poisson_pointwise_observable(pde, Vh, n_obs=15)
    proj = _make_projector(obs, prior, control_dist, serialized=False)
    proj.ms, proj.zs = ms, zs
    proj.construct_input_subspace()
    proj.construct_output_subspace()
    errs = proj.test_errors(ranks=(2, 6, 12), test_input=True, test_output=True)
    assert errs[("input", 2)][0] >= errs[("input", 12)][0]
    assert errs[("output", 2)][0] >= errs[("output", 12)][0]

    U, s, V = proj.construct_low_rank_Jacobians(str(tmp_path) + "/")
    assert U.shape[0] == 8 and s.shape[1] <= 15
    import os

    assert os.path.exists(tmp_path / "Jsvd_data.npz")


@pytest.mark.slow
def test_double_loop_mc_errors(problem):
    """Double-loop MC projection error (reference
    `activeSubspaceProjector.py:1147-1245`): for each rank, the output
    discrepancy when the complement of the rank-r input projection is
    conditionally resampled from the prior.  Checks (a) monotone decay,
    (b) double-loop error <= naive input error at matched rank (the map
    contracts input-space error), and (c) error -> 0 at full rank, where
    the projector is the identity and the inner resample perturbs nothing."""
    pde, prior, control_dist, Vh, ms, zs = problem
    obs = poisson_pointwise_observable(pde, Vh, n_obs=15)
    proj = _make_projector(obs, prior, control_dist, serialized=False)
    full = Vh.dim  # complete R-orthonormal basis => V V^T R = I
    proj.parameters["rank"] = full
    proj.parameters["oversampling"] = 10
    proj.ms, proj.zs = ms, zs
    proj.construct_input_subspace()

    naive = proj.test_errors(ranks=(2, 12), test_input=True)
    dl = proj.test_errors_double_loop(
        ranks=(2, 12, full), n_samples=6, double_loop_samples=4
    )
    e2, e12, efull = (dl[("double_loop", r)][0] for r in (2, 12, full))
    assert e2 >= e12 >= efull
    # the PDE map contracts: output-space conditional-resample error is
    # below the naive input-space projection error at the same rank
    assert e12 <= naive[("input", 12)][0]
    assert efull < 1e-8  # identity projector -> exact reconstruction
    assert dl[("double_loop_discarded", 12)] == (0, 0)
    assert proj._double_loop_errors == [e2, e12, efull]


@pytest.mark.slow
def test_eigenvalue_parity_vs_dense_reference(problem):
    """BASELINE.json accuracy criterion: the randomized GHEP machinery
    reproduces a dense generalized eigensolve of the materialized E[J^T J]
    against R to 1e-8 relative error (f64) when run with power iterations;
    at the reference's own setting (s=1) the deviation is the algorithmic
    randomized error (~1e-5 here), identical for reference and port — exact
    implementation parity at s=1 is asserted by the batched-vs-serialized
    1e-11 test above."""
    from hippyflow_tpu.models import materialize_jacobians
    from hippyflow_tpu.ops import double_pass_g, generalized_eigh

    pde, prior, control_dist, Vh, ms, zs = problem
    obs = poisson_pointwise_observable(pde, Vh, n_obs=15)
    proj = _make_projector(obs, prior, control_dist, serialized=False)
    proj.ms, proj.zs = ms, zs
    proj._ensure_samples()

    Js = materialize_jacobians(obs, proj.samples.ms, proj.samples.us, proj.samples.zs)
    H = jnp.einsum("sqm,sqn->mn", Js, Js) / Js.shape[0]
    R = prior.R_matmat(jnp.eye(prior.dim))
    d_dense, _ = generalized_eigh(0.5 * (H + H.T), 0.5 * (R + R.T))

    avg = lambda X: H @ X
    r, p = 8, 20
    Omega = jax.random.normal(jax.random.PRNGKey(5), (prior.dim, r + p))
    d_rand, V = double_pass_g(
        avg, prior.R_matmat, prior.Rsolver_matmat, Omega, r, s=3
    )
    rel = np.abs(np.asarray(d_rand) - np.asarray(d_dense[:r])) / float(d_dense[0])
    assert float(rel.max()) < 1e-8, rel
