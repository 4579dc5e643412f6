"""Measure Newton-variant wall times on the chip: classical vs Shamanskii
stale-factor, 8- vs 4-way line search, cold vs warm start."""

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

from applications.confusion import confusion_linear_observable, confusion_prior

NX = int(os.environ.get("PROBE_NX", 64))
B = int(os.environ.get("PROBE_BATCH", 256))
VEL = os.environ.get("PROBE_VEL", "analytic")

print("devices:", jax.devices())

variants = {
    "classic k1 ls4": dict(newton_stale_factor=1, n_line_search=4),
    "shamanskii k2 ls4": dict(newton_stale_factor=2, n_line_search=4),
    "shamanskii k3 ls4": dict(newton_stale_factor=3, n_line_search=4),
    "shamanskii k4 ls4": dict(newton_stale_factor=4, n_line_search=4),
}

key = jax.random.PRNGKey(0)
for name, kw in variants.items():
    obs, Vh = confusion_linear_observable(nx=NX, velocity=VEL, **kw)
    prior = confusion_prior(Vh)
    problem = obs.problem
    noise = jax.random.normal(key, (B, Vh.dim), dtype=jnp.float32)
    ms = jax.jit(prior.sample)(noise)
    solve = jax.jit(jax.vmap(lambda m: problem.solve_fwd(m)))
    us, infos = solve(ms)
    jax.block_until_ready(us)
    t0 = time.time()
    for _ in range(3):
        us, infos = solve(ms)
        jax.block_until_ready(us)
    dt = (time.time() - t0) / 3
    print(
        f"{name:22s} {dt * 1e3:8.1f} ms   iters mean "
        f"{float(infos.iterations.mean()):.2f} max {int(infos.iterations.max())}  "
        f"conv {int(infos.converged.sum())}/{B}  "
        f"maxres {float(infos.residual_norm.max()):.2e}"
    )
