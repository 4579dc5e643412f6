"""Surrogate training: l2 and derivative-informed (H1-seminorm) losses.

Replaces the reference's TF1 + hessianlearn stack
(`applications/confusion/dipnet_paper/confusion_training.py:177-217`).

Losses
------
* l2:   mean_i ||f(m_i) - q_i||^2
* h1:   mean_i ||d(Phi^T f)/d(m_r)(m_i) - (J_i^T Phi)^T P||_F^2
  where P is the (frozen) reduced input decoder and J_i^T Phi the stored
  Jacobian sketches (JstarPhi_data.npz from the DataGenerator).  The network
  Jacobian in *reduced* coordinates is rIn forward-mode tangents through the
  network — cheap, batched, MXU-friendly.

Accuracy metric: 1 - ||f - q|| / ||q - q_bar|| per sample, averaged —
hessianlearn's reported "accuracy" convention.

Optimizers: optax adam(w) by default; ``gauss_newton_cg`` implements a
matrix-free inexact Newton-CG step (hessianlearn 'incg' analog) using
jvp/vjp Gauss-Newton products.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax


def l2_loss(apply_fn, params, m, q):
    pred = apply_fn(params, m)
    return jnp.mean(jnp.sum((pred - q) ** 2, axis=-1))


def make_h1_loss(apply_fn, input_decoder, output_encoder):
    """Returns h1(params, m, JstarPhi) matching the stored sketch layout
    (n, dM, rQ) from `dataGenerator.py:170`."""
    P = jnp.asarray(input_decoder)  # (dM, rIn)
    Phi = jnp.asarray(output_encoder)  # (dQ, rQ)

    def reduced_net_jacobian(params, m):
        # d(Phi^T f(m + P dm_r))/d dm_r at dm_r = 0: rIn jvp's
        def g(dm_r):
            return Phi.T @ apply_fn(params, m + P @ dm_r)

        rIn = P.shape[1]
        basis = jnp.eye(rIn, dtype=m.dtype)
        jac = jax.vmap(
            lambda e: jax.jvp(g, (jnp.zeros(rIn, dtype=m.dtype),), (e,))[1]
        )(basis)
        return jac.T  # (rQ, rIn)

    def loss(params, m_batch, JstarPhi_batch):
        def per_sample(m, JstarPhi):
            target = (JstarPhi.T @ P).astype(m.dtype)  # (rQ, rIn) = Phi^T J P
            jac = reduced_net_jacobian(params, m)
            return jnp.sum((jac - target) ** 2)

        return jnp.mean(jax.vmap(per_sample)(m_batch, JstarPhi_batch))

    return loss


def accuracy(apply_fn, params, m, q):
    pred = apply_fn(params, m)
    q_bar = q.mean(axis=0)
    num = jnp.linalg.norm(pred - q, axis=-1)
    den = jnp.linalg.norm(q - q_bar, axis=-1)
    return jnp.mean(1.0 - num / den)


def train(
    model,
    m_data,
    q_data,
    JstarPhi_data=None,
    input_decoder=None,
    output_encoder=None,
    h1_weight: float = 1.0,
    l2_weight: float = 1.0,
    batch_size: int = 128,
    epochs: int = 100,
    learning_rate: float = 1e-3,
    weight_decay: float = 0.0,
    validation_split: float = 0.1,
    seed: int = 0,
    frozen_prefixes: tuple = (),
    verbose: bool = False,
):
    """Train a flax surrogate; returns (params, logger dict).

    The logger mirrors hessianlearn's `_logger` payload persisted by the
    multirun sweeps (`confusion_multirun.py:99-147`): per-epoch train/val
    accuracy and loss.
    """
    m_data = jnp.asarray(m_data)
    q_data = jnp.asarray(q_data)
    n = m_data.shape[0]
    n_val = max(1, int(n * validation_split)) if validation_split else 0
    n_train = n - n_val
    key = jax.random.PRNGKey(seed)
    perm = jax.random.permutation(key, n)
    tr, va = perm[:n_train], perm[n_train:]

    params = model.init(jax.random.PRNGKey(seed + 1), m_data[:1])
    apply_fn = lambda p, m: model.apply(p, m)

    h1 = None
    if JstarPhi_data is not None:
        assert input_decoder is not None and output_encoder is not None
        h1 = make_h1_loss(apply_fn, input_decoder, output_encoder)
        JstarPhi_data = jnp.asarray(JstarPhi_data)

    def total_loss(p, mb, qb, jb):
        loss = l2_weight * l2_loss(apply_fn, p, mb, qb)
        if h1 is not None:
            loss = loss + h1_weight * h1(p, mb, jb)
        return loss

    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    if frozen_prefixes:
        # mask out frozen parameter subtrees (keras trainable=False analog)
        def mask_fn(p):
            def mark(path, _):
                name = "/".join(str(k.key) for k in path if hasattr(k, "key"))
                return not any(name.startswith(fp) for fp in frozen_prefixes)

            return jax.tree_util.tree_map_with_path(mark, p)

        tx = optax.masked(tx, mask_fn(params))
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s, mb, qb, jb):
        loss, grads = jax.value_and_grad(total_loss)(p, mb, qb, jb)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    logger = {"train_acc": [], "val_acc": [], "loss": [], "epoch_time": []}
    steps_per_epoch = max(1, n_train // batch_size)
    rng = np.random.RandomState(seed)
    for epoch in range(epochs):
        t0 = time.time()
        order = rng.permutation(n_train)
        last_loss = None
        for s_idx in range(steps_per_epoch):
            idx = tr[order[s_idx * batch_size : (s_idx + 1) * batch_size]]
            jb = JstarPhi_data[idx] if h1 is not None else None
            params, opt_state, last_loss = step(
                params, opt_state, m_data[idx], q_data[idx], jb
            )
        tr_acc = float(accuracy(apply_fn, params, m_data[tr], q_data[tr]))
        va_acc = (
            float(accuracy(apply_fn, params, m_data[va], q_data[va]))
            if n_val
            else float("nan")
        )
        logger["train_acc"].append(tr_acc)
        logger["val_acc"].append(va_acc)
        logger["loss"].append(float(last_loss))
        logger["epoch_time"].append(time.time() - t0)
        if verbose and (epoch % 10 == 0 or epoch == epochs - 1):
            print(
                f"epoch {epoch:4d} loss {float(last_loss):.4e} "
                f"train_acc {tr_acc:.4f} val_acc {va_acc:.4f}"
            )
    return params, logger


def gauss_newton_cg_step(
    apply_fn, params, m, q, cg_iters: int = 20, damping: float = 1e-4
):
    """One inexact Gauss-Newton/CG step on the l2 loss (hessianlearn 'incg'
    analog): solve (J^T J + damping I) dp = -grad with matrix-free
    Gauss-Newton products via jvp/vjp through the network."""
    flat, unravel = jax.flatten_util.ravel_pytree(params)

    def resid(w):
        return (apply_fn(unravel(w), m) - q).ravel()

    r0, jvp_lin = jax.linearize(resid, flat)
    _, vjp = jax.vjp(resid, flat)

    def gn_mv(v):
        return vjp(jvp_lin(v))[0] + damping * v

    g = vjp(r0)[0]
    dp, _ = jax.scipy.sparse.linalg.cg(gn_mv, -g, maxiter=cg_iters)
    # backtracking on the true loss
    def loss_of(w):
        return 0.5 * jnp.sum(resid(w) ** 2)

    base = loss_of(flat)
    alpha = 1.0
    for _ in range(10):
        if float(loss_of(flat + alpha * dp)) < float(base):
            break
        alpha *= 0.5
    return unravel(flat + alpha * dp)
