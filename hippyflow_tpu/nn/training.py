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


def make_h1_loss(apply_fn, input_decoder, output_encoder, normalized=False):
    """Returns h1(params, m, JstarPhi) matching the stored sketch layout
    (n, dM, rQ) from `dataGenerator.py:170`.

    CONSISTENCY CONTRACT: ``output_encoder`` must be the SAME matrix Phi
    that formed the stored sketches ``JstarPhi = J^T Phi`` (the decoder
    embedded in ``JstarPhi_data.npz``).  Passing a rescaled or
    re-orthogonalized variant (e.g. the network's ``modify_projectors``
    output layer, which is Phi/||Phi||_F with possible QR sign flips)
    silently corrupts the derivative targets: the loss then drives the
    network Jacobian toward a scaled/sign-flipped copy of the true one —
    worse than no derivative data at all.  The network's own projector
    scaling is irrelevant here; only target/encoder agreement matters.

    ``normalized=True`` uses the per-sample RELATIVE Frobenius misfit
    ``||J_net - J||_F^2 / ||J||_F^2`` (the dimensionless H1 form of the
    derivative-informed-surrogate papers; reference README.md:131-151),
    making ``h1_weight`` a unitless mix ratio against the l2 term rather
    than an absolute scale that depends on the Jacobian magnitude."""
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
            mis = jnp.sum((jac - target) ** 2)
            if normalized:
                mis = mis / jnp.maximum(jnp.sum(target**2), 1e-20)
            return mis

        return jnp.mean(jax.vmap(per_sample)(m_batch, JstarPhi_batch))

    return loss


def jstarphi_from_jsvd(U_data, sigma_data, V_data, output_encoder):
    """Jacobian sketches ``J_i^T Phi`` from low-rank Jacobian SVD data.

    Converts the ``Jsvd_data.npz`` schema (`dataGenerator.py:187`:
    ``J_i ~= U_i diag(s_i) V_i^T`` from accuracy-enhanced SVD) into the
    ``JstarPhi_data.npz`` layout ``(n, dM, rQ)`` that `make_h1_loss`
    consumes, so H1 training works from either derivative artifact — the
    reference generates one or the other depending on whether an output
    decoder was available at data-generation time (`dataGenerator.py:
    170-187`).
    """
    U = jnp.asarray(U_data)  # (n, dQ, r)
    s = jnp.asarray(sigma_data)  # (n, r)
    V = jnp.asarray(V_data)  # (n, dM, r)
    Phi = jnp.asarray(output_encoder)  # (dQ, rQ)
    UtPhi = jnp.einsum("nqr,qp->nrp", U, Phi)
    return jnp.einsum("nmr,nrp->nmp", V, s[:, :, None] * UtPhi)


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
    h1_normalized: bool = False,
    l2_weight: float = 1.0,
    batch_size: int = 128,
    epochs: int = 100,
    learning_rate: float = 1e-3,
    weight_decay: float = 0.0,
    validation_split: float = 0.1,
    validation_data=None,
    seed: int = 0,
    frozen_prefixes: tuple = (),
    verbose: bool = False,
    optimizer: str = "adamw",
    cg_iters: int = 20,
    hess_batch_size: int = 16,
    hessian_low_rank: int = 20,
    incg_damping: float = 1e-3,
    record_spectrum: bool = False,
):
    """Train a flax surrogate; returns (params, logger dict).

    The logger mirrors hessianlearn's `_logger` payload persisted by the
    multirun sweeps (`confusion_multirun.py:99-147`): per-epoch train/val
    accuracy and loss (plus ||g|| for the second-order path).

    record_spectrum=True (hessianlearn's `record_spectrum` setting,
    `confusion_training.py:43-44,205`) logs the top-`hessian_low_rank`
    Gauss-Newton Hessian eigenvalues each sweep in
    ``logger['hessian_spectrum']`` — free on the incg path, which already
    eigendecomposes H_GN for its preconditioner.

    optimizer='adamw' (default) is first-order optax; optimizer='incg' is
    the hessianlearn-parity second-order path
    (`confusion_training.py:191-217`): per batch, an inexact Newton step
    solves (H_GN + damping I) dp = -g by matrix-free CG (Gauss-Newton
    products through the network on a smaller ``hess_batch_size`` subsample,
    hessianlearn's hess_batch), preconditioned by a rank-
    ``hessian_low_rank`` randomized eigendecomposition of H_GN refreshed
    each sweep (hessianlearn's `hessian_low_rank=20` LowRankSaddleFreeNewton
    -style preconditioner), globalized by an Armijo backtracking line
    search.  With an h1 term the gradient includes it; curvature is
    Gauss-Newton on the l2 residual only.
    """
    m_data = jnp.asarray(m_data)
    q_data = jnp.asarray(q_data)
    if validation_data is not None:
        # explicit held-out set (the reference multirun's fixed test block,
        # `confusion_multirun.py:90-161`): every data-size sweep point is
        # scored on the SAME samples, so accuracy-vs-data curves compare
        # training sets, not validation draws
        m_val, q_val = validation_data
        n_train = m_data.shape[0]
        m_data = jnp.concatenate([m_data, jnp.asarray(m_val)])
        q_data = jnp.concatenate([q_data, jnp.asarray(q_val)])
        n_val = m_data.shape[0] - n_train
        tr = jnp.arange(n_train)
        va = jnp.arange(n_train, m_data.shape[0])
    else:
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
        h1 = make_h1_loss(
            apply_fn, input_decoder, output_encoder, normalized=h1_normalized
        )
        JstarPhi_data = jnp.asarray(JstarPhi_data)

    def total_loss(p, mb, qb, jb):
        loss = l2_weight * l2_loss(apply_fn, p, mb, qb)
        if h1 is not None:
            loss = loss + h1_weight * h1(p, mb, jb)
        return loss

    if optimizer == "incg":
        return _fit_incg(
            model, apply_fn, params, total_loss, m_data, q_data,
            JstarPhi_data if h1 is not None else None,
            tr, va, n_val,
            l2_weight=l2_weight,
            batch_size=batch_size,
            epochs=epochs,
            seed=seed,
            frozen_prefixes=frozen_prefixes,
            verbose=verbose,
            cg_iters=cg_iters,
            hess_batch_size=hess_batch_size,
            hessian_low_rank=hessian_low_rank,
            damping=incg_damping,
            record_spectrum=record_spectrum,
        )
    assert not record_spectrum, "record_spectrum requires optimizer='incg'"
    assert optimizer == "adamw", f"unknown optimizer {optimizer!r}"

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
    best_params = None
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
        # hessianlearn keeps the best-validation weights ('max_val_acc'
        # printing item + best-weight restore after fit)
        if n_val and (best_params is None or va_acc > logger["max_val_acc"]):
            logger["max_val_acc"] = va_acc
            best_params = params
        if verbose and (epoch % 10 == 0 or epoch == epochs - 1):
            print(
                f"epoch {epoch:4d} loss {float(last_loss):.4e} "
                f"train_acc {tr_acc:.4f} val_acc {va_acc:.4f}"
            )
    return (best_params if best_params is not None else params), logger


def _frozen_flat_mask(params, frozen_prefixes, flat):
    """(nflat,) 0/1 mask over the raveled parameter vector: 0 on frozen
    subtrees (keras trainable=False analog)."""
    if not frozen_prefixes:
        return jnp.ones_like(flat)

    def mark(path, leaf):
        name = "/".join(str(k.key) for k in path if hasattr(k, "key"))
        keep = not any(name.startswith(fp) for fp in frozen_prefixes)
        return jnp.full(jnp.shape(leaf), 1.0 if keep else 0.0, dtype=flat.dtype)

    mask_tree = jax.tree_util.tree_map_with_path(mark, params)
    return jax.flatten_util.ravel_pytree(mask_tree)[0]


def _fit_incg(
    model, apply_fn, params, total_loss, m_data, q_data, J_data,
    tr, va, n_val, *, l2_weight, batch_size, epochs, seed, frozen_prefixes,
    verbose, cg_iters, hess_batch_size, hessian_low_rank, damping,
    record_spectrum=False,
):
    """Inexact Newton-CG fit loop (hessianlearn `HessianlearnModel.fit()`
    with optimizer 'incg', reference
    `applications/confusion/dipnet_paper/confusion_training.py:191-217`).

    Per step: gradient of the full loss on the batch; CG on the damped
    Gauss-Newton system restricted to trainable coordinates, with GN
    products on a ``hess_batch_size`` subsample; low-rank preconditioner
    (randomized rank-k eigendecomposition of H_GN, refreshed per sweep);
    Armijo backtracking ladder."""
    import jax.flatten_util

    flat, unravel = jax.flatten_util.ravel_pytree(params)
    mask = _frozen_flat_mask(params, frozen_prefixes, flat)
    n_train = tr.shape[0]
    hb = min(hess_batch_size, batch_size)
    n_ls = 10
    alphas = jnp.power(0.5, jnp.arange(n_ls, dtype=flat.dtype))

    def loss_flat(w, mb, qb, jb):
        return total_loss(unravel(w), mb, qb, jb)

    def scaled_resid(w, hm, hq):
        # 0.5||r_s||^2 == l2_weight * mean_i ||f - q||^2 on the hess batch
        r = (apply_fn(unravel(w), hm) - hq).ravel()
        return r * jnp.sqrt(2.0 * l2_weight / hm.shape[0])

    def gn_matvec_factory(w, hm, hq):
        _, jvp_lin = jax.linearize(lambda wv: scaled_resid(wv, hm, hq), w)
        _, vjp = jax.vjp(lambda wv: scaled_resid(wv, hm, hq), w)

        def mv(v):
            return mask * vjp(jvp_lin(mask * v))[0] + damping * v

        return mv

    @jax.jit
    def refresh_preconditioner(w, hm, hq, Omega):
        """Rank-k randomized eigendecomposition of the (masked) GN Hessian:
        one-pass Nystrom-free HEP on Y = H Omega, Q = qr(Y), T = Q^T H Q."""
        mv = gn_matvec_factory(w, hm, hq)
        Y = jax.vmap(mv, in_axes=1, out_axes=1)(Omega)
        Q, _ = jnp.linalg.qr(Y)
        HQ = jax.vmap(mv, in_axes=1, out_axes=1)(Q)
        T = Q.T @ HQ
        d, S = jnp.linalg.eigh(0.5 * (T + T.T))
        k = min(hessian_low_rank, d.shape[0])
        d, S = d[::-1][:k], S[:, ::-1][:, :k]
        return Q @ S, d  # (nflat, k), (k,)

    @jax.jit
    def incg_step(w, mb, qb, jb, U, dprec):
        g = mask * jax.grad(loss_flat)(w, mb, qb, jb)
        mv = gn_matvec_factory(w, mb[:hb], qb[:hb])

        def precon(v):
            # (U diag(d) U^T + damping-complement)^{-1} v
            c = U.T @ v
            return v / damping + U @ (c / jnp.maximum(dprec, damping) - c / damping)

        dp, _ = jax.scipy.sparse.linalg.cg(
            mv, -g, M=precon, maxiter=cg_iters
        )
        dp = mask * dp
        base = loss_flat(w, mb, qb, jb)
        gTd = jnp.vdot(g, dp)
        ls = jax.vmap(lambda a: loss_flat(w + a * dp, mb, qb, jb))(alphas)
        ok = ls <= base + 1e-4 * alphas * gTd
        idx = jnp.where(ok.any(), jnp.argmax(ok), jnp.argmin(ls))
        take = ls[idx] < base
        w_new = jnp.where(take, w + alphas[idx] * dp, w)
        return w_new, base, jnp.linalg.norm(g)

    logger = {
        "train_acc": [], "val_acc": [], "loss": [], "epoch_time": [],
        "gnorm": [], "optimizer": "incg",
    }
    if record_spectrum:
        logger["hessian_spectrum"] = []
    steps_per_epoch = max(1, n_train // batch_size)
    rng = np.random.RandomState(seed)
    best_flat = None
    key = jax.random.PRNGKey(seed + 2)
    k_probe = min(hessian_low_rank + 5, flat.shape[0])

    # Overlap the two expensive XLA compiles (preconditioner refresh and
    # the CG+Armijo step program) in threads before the sweep loop — the
    # serial first sweep otherwise pays their sum (see
    # `sampling.precompile_parallel`; same cold-compile argument).
    from .. import config as hf_config

    if hf_config.parallel_precompile():
        import concurrent.futures as cf

        bs = min(batch_size, n_train)
        hb_eff = min(hb, n_train)  # hb_idx = tr[order[:hb]] truncates
        k = min(hessian_low_rank, k_probe)

        def _ex(n_rows, like):
            return jax.ShapeDtypeStruct((n_rows,) + like.shape[1:], like.dtype)

        w_ex = jax.ShapeDtypeStruct(flat.shape, flat.dtype)
        jb_ex = _ex(bs, J_data) if J_data is not None else None
        specs = [
            (
                refresh_preconditioner,
                (w_ex, _ex(hb_eff, m_data), _ex(hb_eff, q_data),
                 jax.ShapeDtypeStruct((flat.shape[0], k_probe), flat.dtype)),
            ),
            (
                incg_step,
                (w_ex, _ex(bs, m_data), _ex(bs, q_data), jb_ex,
                 jax.ShapeDtypeStruct((flat.shape[0], k), flat.dtype),
                 jax.ShapeDtypeStruct((k,), flat.dtype)),
            ),
        ]
        exes = {}
        with cf.ThreadPoolExecutor(max_workers=len(specs)) as pool:
            futs = {
                pool.submit(lambda f=f, ex=ex: f.lower(*ex).compile()): i
                for i, (f, ex) in enumerate(specs)
            }
            for fut, i in futs.items():
                try:
                    exes[i] = fut.result()
                except Exception:
                    pass  # non-fatal: compile on first call instead
        refresh_preconditioner = exes.get(0, refresh_preconditioner)
        incg_step = exes.get(1, incg_step)
    for epoch in range(epochs):
        t0 = time.time()
        order = rng.permutation(n_train)
        # refresh the low-rank preconditioner once per sweep
        hb_idx = tr[order[:hb]]
        Omega = jax.random.normal(
            jax.random.fold_in(key, epoch), (flat.shape[0], k_probe),
            dtype=flat.dtype,
        )
        U, dprec = refresh_preconditioner(
            flat, m_data[hb_idx], q_data[hb_idx], Omega
        )
        if record_spectrum:
            logger["hessian_spectrum"].append(np.asarray(dprec).tolist())
        last_loss, gnorm = None, None
        for s_idx in range(steps_per_epoch):
            idx = tr[order[s_idx * batch_size : (s_idx + 1) * batch_size]]
            jb = J_data[idx] if J_data is not None else None
            flat, last_loss, gnorm = incg_step(
                flat, m_data[idx], q_data[idx], jb, U, dprec
            )
        params = unravel(flat)
        tr_acc = float(accuracy(apply_fn, params, m_data[tr], q_data[tr]))
        va_acc = (
            float(accuracy(apply_fn, params, m_data[va], q_data[va]))
            if n_val
            else float("nan")
        )
        logger["train_acc"].append(tr_acc)
        logger["val_acc"].append(va_acc)
        logger["loss"].append(float(last_loss))
        logger["gnorm"].append(float(gnorm))
        logger["epoch_time"].append(time.time() - t0)
        if n_val and (best_flat is None or va_acc > logger["max_val_acc"]):
            logger["max_val_acc"] = va_acc
            best_flat = flat
        if verbose and (epoch % 10 == 0 or epoch == epochs - 1):
            print(
                f"incg sweep {epoch:4d} loss {float(last_loss):.4e} "
                f"||g|| {float(gnorm):.3e} train_acc {tr_acc:.4f} "
                f"val_acc {va_acc:.4f}"
            )
    return unravel(best_flat if best_flat is not None else flat), logger


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
