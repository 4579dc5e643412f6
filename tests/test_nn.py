"""DIPNet/DIPResNet construction and training tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hippyflow_tpu.nn import (
    accuracy,
    gauss_newton_cg_step,
    jstarphi_from_jsvd,
    l2_loss,
    make_h1_loss,
    projected_dense,
    projected_low_rank_residual_network,
    train,
)

DM, DQ, RIN, ROUT = 40, 10, 6, 5


@pytest.fixture(scope="module")
def projectors():
    key = jax.random.PRNGKey(0)
    P, _ = jnp.linalg.qr(jax.random.normal(key, (DM, RIN)))
    Phi, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(1), (DQ, ROUT)))
    return np.asarray(P), np.asarray(Phi)


@pytest.fixture(scope="module")
def linear_map_data(projectors):
    """Data from a reduced linear map q = Phi A P^T m (exactly representable)."""
    P, Phi = projectors
    A = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (ROUT, RIN)))
    m = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (256, DM)))
    q = m @ P @ A.T @ Phi.T
    J = Phi @ A @ P.T  # constant Jacobian (dQ, dM)
    return m, q, A, J


def test_dipnet_initialization_uses_projectors(projectors):
    P, Phi = projectors
    model = projected_dense(P, Phi)
    m = jnp.zeros((2, DM))
    params = model.init(jax.random.PRNGKey(0), m)
    # output layer kernel initialized to Phi^T
    k = params["params"]["output_layer"]["kernel"]
    np.testing.assert_allclose(np.asarray(k), Phi.T, rtol=1e-6)
    out = model.apply(params, m)
    assert out.shape == (2, DQ)


def test_output_shift_centers_initial_predictions(projectors, linear_map_data):
    """output_shift initializes the output bias to the data mean
    (hessianlearn RegressionProblem(y_mean=q_mean) parity) — the shifted
    model must start with a far better fit on mean-offset data."""
    P, Phi = projectors
    m, q, _, _ = linear_map_data
    q = q + 7.5  # large mean offset
    shift = q.mean(axis=0)
    plain = projected_dense(P, Phi)
    shifted = projected_dense(P, Phi, output_shift=shift)
    mb = jnp.asarray(m[:32])
    p0 = plain.init(jax.random.PRNGKey(0), mb)
    p1 = shifted.init(jax.random.PRNGKey(0), mb)
    np.testing.assert_allclose(
        np.asarray(p1["params"]["output_layer"]["bias"]), np.asarray(shift),
        rtol=1e-6,
    )
    l_plain = float(l2_loss(lambda p, x: plain.apply(p, x), p0, mb, q[:32]))
    l_shift = float(l2_loss(lambda p, x: shifted.apply(p, x), p1, mb, q[:32]))
    assert l_shift < 0.5 * l_plain
    # DIPResNet takes the same argument
    res = projected_low_rank_residual_network(P, Phi, output_shift=shift)
    pr = res.init(jax.random.PRNGKey(0), mb)
    np.testing.assert_allclose(
        np.asarray(pr["params"]["output_layer"]["bias"]), np.asarray(shift),
        rtol=1e-6,
    )


def test_dipresnet_shapes(projectors):
    P, Phi = projectors
    model = projected_low_rank_residual_network(P, Phi, ranks=[3, 3])
    m = jnp.ones((4, DM))
    params = model.init(jax.random.PRNGKey(0), m)
    assert model.apply(params, m).shape == (4, DQ)


@pytest.mark.slow
def test_training_reduces_loss(projectors, linear_map_data):
    P, Phi = projectors
    m, q, A, J = linear_map_data
    model = projected_dense(P, Phi)
    params, logger = train(
        model, m, q, epochs=150, batch_size=64, learning_rate=3e-3, seed=0
    )
    assert logger["loss"][-1] < 0.1 * logger["loss"][0]
    assert logger["val_acc"][-1] > logger["val_acc"][0]


def test_h1_loss_zero_for_exact_linear_net(projectors, linear_map_data):
    """A surrogate that *is* the linear map has zero H1 loss against the
    exact Jacobian sketches."""
    P, Phi = projectors
    m, q, A, J = linear_map_data

    def apply_fn(params, mm):
        return mm @ J.T

    h1 = make_h1_loss(apply_fn, P, Phi)
    JstarPhi = np.repeat((J.T @ Phi)[None], 8, axis=0)  # (n, dM, rOut)
    val = h1({}, jnp.asarray(m[:8]), jnp.asarray(JstarPhi))
    assert float(val) < 1e-18

    # and positive for a wrong map
    def apply_wrong(params, mm):
        return 2.0 * mm @ J.T

    h1w = make_h1_loss(apply_wrong, P, Phi)
    assert float(h1w({}, jnp.asarray(m[:8]), jnp.asarray(JstarPhi))) > 1e-3


def test_h1_loss_normalized_is_scale_invariant(projectors, linear_map_data):
    """normalized=True divides each sample's misfit by ||target||_F^2: the
    loss of a 2x-wrong surrogate is then invariant to the Jacobian's
    absolute scale (h1_weight becomes a unitless mix ratio)."""
    P, Phi = projectors
    m, _, _, J = linear_map_data

    def apply_wrong(params, mm):
        return 2.0 * mm @ J.T

    h1n = make_h1_loss(apply_wrong, P, Phi, normalized=True)
    JstarPhi = np.repeat((J.T @ Phi)[None], 8, axis=0)
    v1 = float(h1n({}, jnp.asarray(m[:8]), jnp.asarray(JstarPhi)))
    # rescale the MAP 100x: targets and net jacobian scale together
    def apply_wrong_big(params, mm):
        return 200.0 * mm @ J.T

    h1n_big = make_h1_loss(apply_wrong_big, P, Phi, normalized=True)
    v2 = float(h1n_big({}, jnp.asarray(m[:8]), 100.0 * jnp.asarray(JstarPhi)))
    np.testing.assert_allclose(v1, v2, rtol=1e-10)
    # 2x-wrong jacobian with exact-scale targets: relative misfit = 1.0
    np.testing.assert_allclose(v1, 1.0, rtol=1e-10)


def test_h1_loss_encoder_mismatch_corrupts_targets(projectors, linear_map_data):
    """Regression for the round-4 sweep defect: sketches built with the
    orthonormal Phi but the loss evaluated with a RESCALED encoder
    (modify_projectors' Phi/||Phi||_F output layer) give a large H1 loss
    even for the EXACT surrogate — the encoder must be the sketch Phi
    (see make_h1_loss's consistency contract)."""
    P, Phi = projectors
    m, _, _, J = linear_map_data

    def apply_exact(params, mm):
        return mm @ J.T

    JstarPhi = np.repeat((J.T @ Phi)[None], 8, axis=0)  # sketch with Phi
    scale = np.linalg.norm(Phi)  # = sqrt(ROUT) for orthonormal Phi
    h1_bad = make_h1_loss(apply_exact, P, Phi / scale, normalized=True)
    v_bad = float(h1_bad({}, jnp.asarray(m[:8]), jnp.asarray(JstarPhi)))
    h1_good = make_h1_loss(apply_exact, P, Phi, normalized=True)
    v_good = float(h1_good({}, jnp.asarray(m[:8]), jnp.asarray(JstarPhi)))
    assert v_good < 1e-18
    # relative misfit of a (1/||Phi||)-scaled jacobian: (1 - 1/sqrt(5))^2
    np.testing.assert_allclose(v_bad, (1.0 - 1.0 / scale) ** 2, rtol=1e-6)


def test_h1_training_improves_jacobian_fit(projectors, linear_map_data):
    P, Phi = projectors
    m, q, A, J = linear_map_data
    JstarPhi = np.repeat((J.T @ Phi)[None], m.shape[0], axis=0)
    model = projected_dense(P, Phi)
    params0 = model.init(jax.random.PRNGKey(1), jnp.asarray(m[:1]))
    l2_before = float(l2_loss(model.apply, params0, m, q))
    params, logger = train(
        model,
        m,
        q,
        JstarPhi_data=JstarPhi,
        input_decoder=P,
        output_encoder=Phi,
        h1_weight=0.5,
        epochs=60,
        batch_size=64,
        seed=1,
    )
    l2_after = float(l2_loss(model.apply, params, m, q))
    assert np.isfinite(l2_after)
    assert l2_after < l2_before


def test_record_spectrum_logs_gn_eigenvalues(projectors, linear_map_data):
    """record_spectrum (hessianlearn parity) logs the descending top-k GN
    Hessian eigenvalues once per sweep on the incg path."""
    P, Phi = projectors
    m, q, _, _ = linear_map_data
    model = projected_dense(P, Phi)
    _, logger = train(
        model, m, q, epochs=2, batch_size=64, optimizer="incg",
        hessian_low_rank=6, record_spectrum=True, seed=0,
    )
    spec = logger["hessian_spectrum"]
    assert len(spec) == 2 and len(spec[0]) == 6
    assert all(a >= b - 1e-12 for a, b in zip(spec[0], spec[0][1:]))
    with pytest.raises(AssertionError):
        train(model, m, q, epochs=1, record_spectrum=True)  # adamw


def test_train_returns_best_validation_weights(projectors, linear_map_data):
    """hessianlearn parity: fit() tracks max_val_acc and restores the
    best-validation weights, not the last iterate."""
    P, Phi = projectors
    m, q, _, _ = linear_map_data
    model = projected_dense(P, Phi)
    params, logger = train(model, m, q, epochs=4, batch_size=64, seed=0)
    assert logger["max_val_acc"] == max(logger["val_acc"])
    n_val = max(1, int(m.shape[0] * 0.1))
    # returned weights reproduce the best epoch's validation accuracy
    perm = np.asarray(jax.random.permutation(jax.random.PRNGKey(0), m.shape[0]))
    va = perm[m.shape[0] - n_val:]
    got = float(accuracy(lambda p, x: model.apply(p, x), params,
                         jnp.asarray(m[va]), jnp.asarray(q[va])))
    assert abs(got - logger["max_val_acc"]) < 1e-5


def test_jstarphi_from_jsvd_matches_exact_sketch(projectors, linear_map_data):
    """Jsvd_data.npz -> JstarPhi conversion: for J_i = U_i s_i V_i^T the
    sketch must equal J_i^T Phi exactly (both derivative artifacts feed the
    same H1 loss, `dataGenerator.py:170-187`)."""
    _, Phi = projectors
    _, _, _, J = linear_map_data
    n, r = 7, min(J.shape)
    # per-sample scaled copies of J give distinct exact SVDs
    scales = np.linspace(0.5, 2.0, n)
    U, s, Vt = np.linalg.svd(J, full_matrices=False)
    U_data = np.repeat(U[None], n, axis=0)
    sigma_data = scales[:, None] * s[None, :]
    V_data = np.repeat(Vt.T[None], n, axis=0)
    got = np.asarray(jstarphi_from_jsvd(U_data, sigma_data, V_data, Phi))
    expected = np.stack([(sc * J).T @ Phi for sc in scales])
    np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-13)
    assert got.shape == (n, J.shape[1], Phi.shape[1])


def test_frozen_input_projection_is_constant(projectors, linear_map_data):
    """The input projector is a module constant: training cannot change it
    (keras trainable=False parity)."""
    P, Phi = projectors
    m, q, _, _ = linear_map_data
    model = projected_dense(P, Phi)
    params, _ = train(model, m, q, epochs=3, batch_size=64)
    # P lives outside params entirely
    flat = jax.tree_util.tree_leaves(params)
    assert not any(l.shape == (DM, RIN) for l in flat)


@pytest.mark.slow
def test_gauss_newton_cg_step(projectors, linear_map_data):
    import jax.flatten_util  # noqa: F401  (used inside)

    P, Phi = projectors
    m, q, _, _ = linear_map_data
    model = projected_dense(P, Phi)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(m[:1]))
    apply_fn = lambda p, mm: model.apply(p, mm)
    l0 = float(l2_loss(apply_fn, params, m[:64], q[:64]))
    p1 = gauss_newton_cg_step(apply_fn, params, jnp.asarray(m[:64]), jnp.asarray(q[:64]))
    l1 = float(l2_loss(apply_fn, p1, m[:64], q[:64]))
    assert l1 < l0


@pytest.mark.slow
def test_incg_training_matches_or_beats_adam(projectors, linear_map_data):
    """The integrated second-order path (train(optimizer='incg'), the
    hessianlearn fit() analog with CG + line search + rank-k Hessian
    preconditioning) reaches at most adam's loss in far fewer sweeps
    (reference `confusion_training.py:191-217`)."""
    P, Phi = projectors
    m, q, A, J = linear_map_data
    model = projected_dense(P, Phi)
    _, log_adam = train(
        model, m, q, epochs=60, batch_size=64, learning_rate=3e-3, seed=0
    )
    params_incg, log_incg = train(
        model, m, q, epochs=12, batch_size=64, seed=0,
        optimizer="incg", cg_iters=25, hessian_low_rank=10,
        hess_batch_size=32,
    )
    assert np.isfinite(log_incg["loss"][-1])
    # monotone-ish: line search never accepts an increase on its batch
    assert log_incg["loss"][-1] <= log_incg["loss"][0]
    # second-order convergence: <= adam's final loss in 1/5 the sweeps
    assert log_incg["loss"][-1] <= log_adam["loss"][-1]
    assert log_incg["val_acc"][-1] >= 0.9 * log_adam["val_acc"][-1]
    # gradient-norm telemetry is recorded (hessianlearn logger parity)
    assert len(log_incg["gnorm"]) == 12


def test_incg_respects_frozen_prefixes(projectors, linear_map_data):
    """incg must not move parameters under frozen prefixes (keras
    trainable=False parity through the flat-mask restriction)."""
    P, Phi = projectors
    m, q, _, _ = linear_map_data
    model = projected_dense(P, Phi)
    params0 = model.init(jax.random.PRNGKey(0), jnp.asarray(m[:1]))
    k0 = np.asarray(params0["params"]["output_layer"]["kernel"])
    params, _ = train(
        model, m, q, epochs=2, batch_size=64, seed=0,
        optimizer="incg", cg_iters=5, hessian_low_rank=4,
        frozen_prefixes=("params/output_layer",),
    )
    k1 = np.asarray(params["params"]["output_layer"]["kernel"])
    np.testing.assert_array_equal(k0, k1)
