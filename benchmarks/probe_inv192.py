"""Where does the nx=192 forward solve spend its time at the kernel level?

At nx=64 (s=65, batch 256) the batched 65x65 matmuls are issue-bound at
~0.7 TF/s and the blocked Pallas GJ inverse is the fastest inverse.  At
nx=192 the shapes flip: s=193 (MXU-sized blocks) but the sample chunk is
only 32, so per-scan-step ops are (32, 193, 193).  This probe times, at
exactly those shapes:

  * batched inverse: blocked Pallas GJ vs rank-1 Pallas vs XLA LU inv
  * the Thomas-step einsums (two (32,193,193)x(32,193,193) bmms)
  * one full thomas-inv factorization step chain (scan of nb=193)

to decide whether the structured-solver inverse kernel choice should be
size-dependent.
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

from hippyflow_tpu.ops.pallas_kernels import batched_inverse

S = int(os.environ.get("PROBE_S", 193))
B = int(os.environ.get("PROBE_BATCH", 32))
NB = int(os.environ.get("PROBE_NB", 193))

print(f"s={S} batch={B} nb={NB}", flush=True)
rng = np.random.RandomState(0)
X = jnp.asarray(
    rng.randn(B, S, S) + 4.0 * np.eye(S), dtype=jnp.float32
)
Y = jnp.asarray(rng.randn(B, S, S), dtype=jnp.float32)


def timed(name, fn, *args, iters=10, flops=None):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    rate = "" if flops is None else f"  {flops / dt / 1e12:6.2f} TF/s"
    print(f"{name:46s} {dt * 1e3:9.2f} ms{rate}", flush=True)
    return out, dt


# single-step shapes: many iters to beat the latency floor; chain 16 steps
def chain(fn, n=16):
    def run(x):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out
    return jax.jit(run), n


inv_flops = 2.0 * B * S**3
bmm_flops = 2.0 * B * S**3

inv_blocked, nch = chain(lambda x: batched_inverse(x, force="pallas") + 0.0)
timed("blocked Pallas GJ inverse (chain16)", inv_blocked, X,
      flops=inv_flops * nch)
inv_rank1, _ = chain(lambda x: batched_inverse(x, force="pallas_rank1") + 0.0)
timed("rank-1 Pallas GJ inverse (chain16)", inv_rank1, X,
      flops=inv_flops * nch)
inv_xla, _ = chain(lambda x: jnp.linalg.inv(x) + 0.0)
timed("XLA LU inverse (chain16)", inv_xla, X, flops=inv_flops * nch)

bmm, _ = chain(lambda x: jnp.einsum("kij,kjl->kil", x, Y))
timed("bmm (32,193,193)x(.) (chain16)", bmm, X, flops=bmm_flops * nch)

# correctness spot check
xb = batched_inverse(X, force="pallas")
xl = jnp.linalg.inv(X)
print("blocked-vs-XLA inverse rel err:",
      float(jnp.max(jnp.abs(xb - xl)) / jnp.max(jnp.abs(xl))), flush=True)
