"""Parallel-prefix (associative_scan) transpose solve on Thomas factors,
vs the CR adjoint-only factorization + solve it would replace.

The block-bidiagonal sweeps of a Thomas solve are linear recurrences
y_j = c_j + G_j y_{j-1}; representing each step as an affine map
(G, c): y -> G y + c makes them associative, so lax.associative_scan
evaluates all prefixes in log2(nb) levels of batched (s,s)x(s,s) and
(s,s)x(s,k) matmuls — CR's parallelism without CR's separate 16 s^3 nb
factorization (Thomas factorization is 7 s^3 nb and serves both
directions).
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

ON_CPU = os.environ.get("PROBE_CPU", "0") == "1"
if ON_CPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
try:
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".bench", "jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

from hippyflow_tpu.ops.structured import (
    InverseThomasFactor,
    factorize_block_cyclic_banded,
    factorize_thomas_inv_banded,
)


def _affine_compose(a, b):
    """Compose affine maps y -> G y + c elementwise along the scan axis;
    b is applied AFTER a."""
    Ga, ca = a
    Gb, cb = b
    return (
        jnp.einsum("...ij,...jl->...il", Gb, Ga),
        jnp.einsum("...ij,...jl->...il", Gb, ca) + cb,
    )


def _prefix_compose(G, c):
    """Inclusive prefix composition of affine maps along axis 0, hand-rolled
    odd/even recursion (the lax.associative_scan lowering miscompiles at
    batch 256 on TPU; this uses only the strided-slice + batched-einsum
    idiom of `_cr_reduce`).  Returns (Gp, cp): (Gp_j, cp_j) = e_j o ... o e_0.
    Work ~2n composes, depth 2 log2(n)."""
    n = G.shape[0]
    if n == 1:
        return G, c
    Ge, ce = G[0::2], c[0::2]
    Go, co = G[1::2], c[1::2]
    ne, no = Ge.shape[0], Go.shape[0]
    # pair_k = e_{2k+1} o e_{2k}
    Fg, Fc = _prefix_compose(*_affine_compose((Ge[:no], ce[:no]), (Go, co)))
    # odd outputs are the pair prefixes; even outputs:
    # y_0 = e_0, y_{2k} = e_{2k} o F_{k-1}
    Gev2, cev2 = _affine_compose((Fg[: ne - 1], Fc[: ne - 1]), (Ge[1:], ce[1:]))
    Gev = jnp.concatenate([Ge[:1], Gev2], axis=0)
    cev = jnp.concatenate([ce[:1], cev2], axis=0)
    Gout = jnp.zeros_like(G)
    cout = jnp.zeros_like(c)
    Gout = Gout.at[0::2].set(Gev).at[1::2].set(Fg)
    cout = cout.at[0::2].set(cev).at[1::2].set(Fc)
    return Gout, cout


def thomas_trans_solve_prefix(f: InverseThomasFactor, b):
    """Like thomas_trans_solve_assoc but with the hand-rolled prefix."""
    nb, s = f.nb, f.s
    bb = b.reshape(nb, s, -1)
    DinvT = jnp.swapaxes(f.Dinv, -1, -2)
    BT = jnp.swapaxes(f.B, -1, -2)
    MT = jnp.swapaxes(f.M, -1, -2)
    c = jnp.einsum("kij,kjl->kil", DinvT, bb)
    G = -jnp.einsum("kij,kjl->kil", DinvT[1:], BT[:-1])
    G = jnp.concatenate([jnp.zeros_like(G[:1]), G], axis=0)
    _, z = _prefix_compose(G, c)
    H = -jnp.concatenate([MT[1:], jnp.zeros_like(MT[:1])], axis=0)[::-1]
    _, xr = _prefix_compose(H, z[::-1])
    return xr[::-1].reshape(nb * s, -1)


def thomas_trans_solve_assoc(f: InverseThomasFactor, b):
    """A^T x = b via two parallel-prefix bidiagonal sweeps. b: (n, k)."""
    nb, s = f.nb, f.s
    bb = b.reshape(nb, s, -1)
    DinvT = jnp.swapaxes(f.Dinv, -1, -2)
    BT = jnp.swapaxes(f.B, -1, -2)
    MT = jnp.swapaxes(f.M, -1, -2)
    # sweep 1 (U^T z = b): z_j = DinvT_j b_j - (DinvT_j BT_{j-1}) z_{j-1}
    c = jnp.einsum("kij,kjl->kil", DinvT, bb)
    G = -jnp.einsum("kij,kjl->kil", DinvT[1:], BT[:-1])
    G = jnp.concatenate([jnp.zeros_like(G[:1]), G], axis=0)
    _, z = jax.lax.associative_scan(_affine_compose, (G, c), axis=0)
    # sweep 2 (L^T x = z), backward: x_j = z_j - MT_{j+1} x_{j+1}.
    # Flip to a forward recurrence and reuse the same compose.
    H = -jnp.concatenate([MT[1:], jnp.zeros_like(MT[:1])], axis=0)[::-1]
    _, xr = jax.lax.associative_scan(_affine_compose, (H, z[::-1]), axis=0)
    return xr[::-1].reshape(nb * s, -1)


def main():
    rng = np.random.RandomState(0)
    if ON_CPU:
        nb, s, Bn, k = 9, 5, 3, 4
    else:
        nb, s, Bn, k = (
            int(os.environ.get("PROBE_NB", 65)),
            int(os.environ.get("PROBE_S", 65)),
            int(os.environ.get("PROBE_BATCH", 256)),
            int(os.environ.get("PROBE_K", 100)),
        )
    nb = int(os.environ.get("PROBE_NB", nb))
    s = int(os.environ.get("PROBE_S", s))
    Bn = int(os.environ.get("PROBE_BATCH", Bn))
    k = int(os.environ.get("PROBE_K", k))
    force_f32 = os.environ.get("PROBE_F32", "0") == "1"
    dtype = jnp.float32 if (force_f32 or not ON_CPU) else jnp.float64
    if ON_CPU:
        band = 0.25 * rng.randn(Bn, nb, s, 3 * s)
        for i in range(Bn):
            band[i, :, :, s : 2 * s] += 4.0 * np.eye(s)
            band[i, 0, :, :s] = 0.0
            band[i, -1, :, 2 * s :] = 0.0
        band = jnp.asarray(band, dtype=dtype)
        rhs = jnp.asarray(rng.randn(Bn, nb * s, k), dtype=band.dtype)
    else:
        # build ON DEVICE: a host-built band is ~1 GB at batch 256 and the
        # tunnel upload dominates (or wedges) the whole probe
        @jax.jit
        def make_band(key):
            bd = 0.25 * jax.random.normal(key, (Bn, nb, s, 3 * s), dtype=dtype)
            bd = bd.at[:, :, :, s : 2 * s].add(4.0 * jnp.eye(s, dtype=dtype))
            bd = bd.at[:, 0, :, :s].set(0.0)
            bd = bd.at[:, -1, :, 2 * s :].set(0.0)
            return bd

        band = make_band(jax.random.PRNGKey(0))
        rhs = jax.random.normal(
            jax.random.PRNGKey(1), (Bn, nb * s, k), dtype=dtype
        )
        jax.block_until_ready(band)
        print("band built on device", flush=True)

    fac_thomas = jax.jit(jax.vmap(factorize_thomas_inv_banded))
    fac_cr_adj = jax.jit(
        jax.vmap(
            lambda bd: factorize_block_cyclic_banded(
                bd, with_transpose=True, with_forward=False
            )
        )
    )
    solve_assoc = jax.jit(jax.vmap(thomas_trans_solve_assoc))
    solve_prefix = jax.jit(jax.vmap(thomas_trans_solve_prefix))
    solve_cr = jax.jit(jax.vmap(lambda f, r: f.solve(r, trans=True)))
    solve_seq = jax.jit(jax.vmap(lambda f, r: f.solve(r, trans=True)))

    with_prefix = os.environ.get("PROBE_PREFIX", "0") == "1"
    ft = fac_thomas(band)
    fc = fac_cr_adj(band)
    x_cr = solve_cr(fc, rhs)
    x_seq = solve_seq(ft, rhs)
    err_s_cr = float(jnp.max(jnp.abs(x_seq - x_cr)) / jnp.max(jnp.abs(x_cr)))
    print(f"seq vs CR rel err:     {err_s_cr:.3e}")
    x_prefix = x_seq
    if with_prefix:
        x_prefix = solve_prefix(ft, rhs)
        err_p_cr = float(jnp.max(jnp.abs(x_prefix - x_cr)) / jnp.max(jnp.abs(x_cr)))
        err_p_seq = float(jnp.max(jnp.abs(x_prefix - x_seq)) / jnp.max(jnp.abs(x_seq)))
        print(f"prefix vs CR rel err:  {err_p_cr:.3e}")
        print(f"prefix vs seq rel err: {err_p_seq:.3e}")
    if os.environ.get("PROBE_ASSOC", "0") == "1":
        x_assoc = solve_assoc(ft, rhs)
        err_vs_cr = float(jnp.max(jnp.abs(x_assoc - x_cr)) / jnp.max(jnp.abs(x_cr)))
        err_vs_seq = float(jnp.max(jnp.abs(x_assoc - x_seq)) / jnp.max(jnp.abs(x_seq)))
        print(f"assoc vs CR rel err:  {err_vs_cr:.3e}")
        print(f"assoc vs seq rel err: {err_vs_seq:.3e}")
    x_assoc = x_prefix
    if ON_CPU:
        if force_f32:
            return
        # dense reference
        for i in range(Bn):
            A = np.zeros((nb * s, nb * s))
            bd = np.asarray(band[i])
            for j in range(nb):
                A[j * s : (j + 1) * s, j * s : (j + 1) * s] = bd[j, :, s : 2 * s]
                if j > 0:
                    A[j * s : (j + 1) * s, (j - 1) * s : j * s] = bd[j, :, :s]
                if j < nb - 1:
                    A[j * s : (j + 1) * s, (j + 1) * s : (j + 2) * s] = bd[j, :, 2 * s :]
            xd = np.linalg.solve(A.T, np.asarray(rhs[i]))
            np.testing.assert_allclose(np.asarray(x_assoc[i]), xd, rtol=1e-9, atol=1e-10)
        print("dense reference check ok")
        return

    def timed(name, fn, *args, iters=3):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
            jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        print(f"{name:46s} {dt * 1e3:9.1f} ms", flush=True)
        return dt

    print(f"\nnb={nb} s={s} batch={Bn} k={k}")
    t_ft = timed("thomas factorization", fac_thomas, band)
    t_fc = timed("CR adjoint-only factorization", fac_cr_adj, band)
    if with_prefix:
        t_sp = timed("prefix trans solve (thomas factors)", solve_prefix, ft, rhs)
    t_sq = timed("seq trans solve (thomas factors)", solve_seq, ft, rhs)
    t_sc = timed("CR trans solve", solve_cr, fc, rhs)
    msg = (
        f"\njac-stage factor+solve: thomas+seq {1e3 * (t_ft + t_sq):.0f} ms"
        f"  vs  CR {1e3 * (t_fc + t_sc):.0f} ms"
    )
    if with_prefix:
        msg += f"  vs  thomas+prefix {1e3 * (t_ft + t_sp):.0f} ms"
    print(msg)


if __name__ == "__main__":
    main()
