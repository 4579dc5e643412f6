"""Round-3 CR factorization micro-probes.

Q1: are the level einsums PRECISION-PASS bound?  matmul precision
"highest" runs f32 via 6 bf16 passes; "high" uses 3.  The Newton STALL
measured in round 2 was with the precision set globally (residual evals
included); a factor built at lower precision only weakens the Newton
step direction (inexact Newton), so per-op precision inside the
factorization may be safe — measure the speed first.

Q2: where do the deep levels cost?  Time _cr_reduce at every level size
plus a block-Thomas scan on small coarse systems, to size a hybrid
CR -> Thomas switchover.
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

from hippyflow_tpu.ops.structured import _cr_reduce, factorize_block_tridiag

B = int(os.environ.get("PROBE_BATCH", 256))
S = int(os.environ.get("PROBE_S", 65))
NB = int(os.environ.get("PROBE_NB", 65))
CHAIN = int(os.environ.get("PROBE_CHAIN", 10))

print("devices:", jax.devices())


def chain_timed(name, fn, x, n=CHAIN, flops=None):
    @jax.jit
    def composite(x0):
        y = x0
        acc = 0.0
        for i in range(n):
            y = fn(y)
            acc = acc + y.ravel()[i]
            y = y + acc * 1e-30
        return y, acc

    out = composite(x)
    jax.block_until_ready(out)
    t0 = time.time()
    out = composite(x)
    _ = float(out[1])
    dt = (time.time() - t0) / n
    rate = f"  {flops / dt / 1e12:7.2f} TFLOP/s" if flops else ""
    print(f"{name:56s} {dt * 1e3:9.2f} ms{rate}")
    return dt


# ---- Q1: einsum precision ladder at the level-0 shape ----------------------
N0 = B * (NB // 2)
key = jax.random.PRNGKey(0)
A1 = jax.random.normal(key, (N0, S, S), dtype=jnp.float32)
A2 = jax.random.normal(jax.random.PRNGKey(1), (N0, S, S), dtype=jnp.float32)
jax.block_until_ready((A1, A2))
mm_flops = 2.0 * N0 * S**3

print(f"\n-- batched matmul ({N0}, {S}, {S}) precision ladder --")
for prec in ("highest", "high", "default"):
    chain_timed(
        f"einsum kij,kjl precision={prec}",
        lambda x, p=prec: jnp.einsum("kij,kjl->kil", x, A2, precision=p),
        A1, flops=mm_flops,
    )

# bf16 storage + default precision (pure MXU passes)
A1h = A1.astype(jnp.bfloat16)
A2h = A2.astype(jnp.bfloat16)
jax.block_until_ready((A1h, A2h))
chain_timed(
    "einsum bf16 storage, default precision",
    lambda x: jnp.einsum("kij,kjl->kil", x, A2h, precision="default"),
    A1h, flops=mm_flops,
)

# ---- Q2: per-level _cr_reduce cost -----------------------------------------
def dd_blocks(k2, n):
    X = jax.random.normal(k2, (n, S, S), dtype=jnp.float32)
    return X + S * jnp.broadcast_to(jnp.eye(S, dtype=jnp.float32), X.shape)


print("\n-- per-level _cr_reduce cost (vmapped over batch) --")
m = NB
total = 0.0
while m > 1:
    a = jax.random.normal(jax.random.PRNGKey(2), (B, m, S, S), jnp.float32) * 0.1
    d = jax.vmap(lambda k3: dd_blocks(k3, m))(
        jax.random.split(jax.random.PRNGKey(3), B))
    bq = jax.random.normal(jax.random.PRNGKey(4), (B, m, S, S), jnp.float32) * 0.1
    jax.block_until_ready((a, d, bq))
    lvl_flops = B * ((m // 2) * 4 * S**3 + ((m + 1) // 2) * 6 * 2 * S**3)

    def lvl(dx, a=a, bq=bq, m=m):
        _, (a2, d2, b2) = jax.vmap(_cr_reduce)(a, dx, bq)
        reps = -(-m // d2.shape[1])
        big = jnp.tile(d2, (1, reps, 1, 1))[:, :m]
        return big + S * jnp.eye(S, dtype=big.dtype)

    dt = chain_timed(f"cr level at m={m}", lvl, d, flops=lvl_flops)
    total += dt
    m = (m + 1) // 2
print(f"sum over levels: {total * 1e3:.2f} ms")

# ---- Q2b: block-Thomas scan on small coarse systems ------------------------
print("\n-- block-Thomas scan at coarse sizes --")
for m in (3, 5, 9, 17):
    a = jax.random.normal(jax.random.PRNGKey(5), (B, m, S, S), jnp.float32) * 0.1
    d = jax.vmap(lambda k4: dd_blocks(k4, m))(
        jax.random.split(jax.random.PRNGKey(6), B))
    bq = jax.random.normal(jax.random.PRNGKey(7), (B, m, S, S), jnp.float32) * 0.1
    jax.block_until_ready((a, d, bq))
    th_flops = B * m * 7 * S**3

    def th(dx, a=a, bq=bq):
        F = jax.vmap(factorize_block_tridiag)(dx, a, bq)
        return dx + F.Dlu * 1e-30

    chain_timed(f"thomas factorize at m={m}", th, d, n=4, flops=th_flops)
