"""Micro-profile of the cyclic-reduction factorization on the chip.

Breaks the 257 ms/iteration factorization cost (probe_forward.py) into:
GJ inverses (rank-1 vs blocked Pallas), the level einsums, and the full
factorize_block_cyclic_banded — to locate the round-3 kernel headroom.

Measurement: sub-100ms ops over the axon tunnel cannot be timed by repeated
identical dispatch (the platform memoizes; see memory notes).  Each op is
timed as ONE jitted composite chaining n data-dependent applications (a tiny
additive tweak between steps defeats CSE), so per-application time =
composite time / n at >100ms total.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

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

from hippyflow_tpu.ops.pallas_kernels import (
    _auto_tile,
    _batched_inverse_blocked,
    _batched_inverse_pallas,
)
from hippyflow_tpu.ops.structured import (
    _cr_reduce,
    factorize_block_cyclic_banded,
)

B = int(os.environ.get("PROBE_BATCH", 256))
S = int(os.environ.get("PROBE_S", 65))
NB = int(os.environ.get("PROBE_NB", 65))
CHAIN = int(os.environ.get("PROBE_CHAIN", 10))

print("devices:", jax.devices())


def chain_timed(name, fn, x, n=CHAIN, flops=None):
    """Time fn via one jitted chain of n data-dependent applications."""

    @jax.jit
    def composite(x0):
        y = x0
        acc = 0.0
        for i in range(n):
            y = fn(y)
            acc = acc + y.ravel()[i]  # data dependence on every step
            y = y + acc * 1e-30  # perturb next input (defeats CSE/memoization)
        return y, acc

    out = composite(x)
    jax.block_until_ready(out)
    t0 = time.time()
    out = composite(x)
    _ = float(out[1])  # scalar readback
    dt = (time.time() - t0) / n
    rate = f"  {flops / dt / 1e12:7.2f} TFLOP/s" if flops else ""
    print(f"{name:56s} {dt * 1e3:9.2f} ms{rate}")
    return dt


def dd_blocks(key, n):
    X = jax.random.normal(key, (n, S, S), dtype=jnp.float32)
    return X + S * jnp.broadcast_to(jnp.eye(S, dtype=jnp.float32), X.shape)


key = jax.random.PRNGKey(0)
N0 = B * (NB // 2)  # level-0 odd-block count
X = dd_blocks(key, N0)
jax.block_until_ready(X)
gj_flops = 4.0 * N0 * S**3
print(f"\n-- batched inverse at level-0 size ({N0}, {S}, {S}) --")
tile = _auto_tile(S, 4)
print(f"auto tile = {tile}")
# inverse chains cleanly: inv is an involution up to the perturbation
chain_timed(
    f"rank-1 Pallas GJ (tile={tile})",
    lambda x: _batched_inverse_pallas(x, tile), X, flops=gj_flops,
)
for bs in (13, 16, 26):
    for t2 in sorted({tile, tile // 2, 8}):
        try:
            chain_timed(
                f"blocked Pallas GJ (tile={t2}, bs={bs})",
                lambda x, t2=t2, bs=bs: _batched_inverse_blocked(x, t2, bs),
                X, flops=gj_flops,
            )
        except Exception as e:
            print(f"  blocked tile={t2} bs={bs} failed: {str(e)[:120]}")

chain_timed(
    "XLA jnp.linalg.inv (LU)", jnp.linalg.inv, X, n=3, flops=gj_flops,
)

# one full CR level 0, vmapped over B, chained via d <- d_new recycling
a = jax.random.normal(jax.random.PRNGKey(1), (B, NB, S, S), dtype=jnp.float32) * 0.1
d = jax.vmap(lambda k: dd_blocks(k, NB))(jax.random.split(jax.random.PRNGKey(2), B))
b = jax.random.normal(jax.random.PRNGKey(3), (B, NB, S, S), dtype=jnp.float32) * 0.1
jax.block_until_ready((a, d, b))

lvl_flops = B * ((NB // 2) * 4 * S**3 + (NB // 2 + 1) * 6 * 2 * S**3)

print("\n-- one CR level (vmapped over batch) --")


def lvl(dx):
    _, (a2, d2, b2) = jax.vmap(_cr_reduce)(a, dx, b)
    # re-expand to (B, NB, S, S) for chaining: tile + diagonal boost
    reps = -(-NB // d2.shape[1])
    big = jnp.tile(d2, (1, reps, 1, 1))[:, :NB]
    return big + S * jnp.eye(S, dtype=big.dtype)


chain_timed("cr level 0 (inverse + einsums + slices)", lvl, d, flops=lvl_flops)

# full factorization chained: consume factor leaves back into the band
band = jnp.concatenate([a, d, b], axis=3)
jax.block_until_ready(band)

fac_flops = 2 * lvl_flops  # levels sum ~ 2x level 0


def fac_step(bd):
    F = jax.vmap(lambda x: factorize_block_cyclic_banded(x, with_transpose=False))(bd)
    lv0 = F.levels[0]
    # feed the level-0 outputs back into a band of the original shape
    upd = jnp.concatenate(
        [lv0.alpha, lv0.beta], axis=1
    )  # (B, ~NB, S, S)
    reps = -(-NB // upd.shape[1])
    upd = jnp.tile(upd, (1, reps, 1, 1))[:, :NB]
    bd2 = bd.at[:, :, :, S : 2 * S].add(upd * 1e-30)
    return bd2


print("\n-- full factorization (band, no transpose) --")
chain_timed("factorize_block_cyclic_banded", fac_step, band, n=5, flops=fac_flops)

print("\n(compare: probe_forward measured 257.6 ms for bc+factorization, "
      "48 ms for the level-0 rank-1 inverse in round 2)")
