"""Nested-iteration depth at nx=192: does a third grid pay?

probe_gridseq.py measured the 2-grid warm start at nx=192 as
coarse 421 ms + fine 515 ms per 32 samples — the coarse stage is 45% of
the cost and its nx=96 Newton itself cold-runs ~4 iterations.  This probe
times the warm-start MAP (noise -> u0) at depths 1..3: each extra level
warm-starts the level above from a 2x-coarser solve, with only the
coarsest grid cold-starting (fem/multigrid.py coarser_levels).

The fine Newton stage is depth-independent (same u0 quality to solver
tolerance), so only the map is timed; run strictly alone (single-tenant
tunnel).

Measured (v5e; fine iters and convergence are depth-independent):
  nx=192 batch  32: depth 1/2/3 = 417.3/248.6/228.6 ms
  nx= 64 batch 256: depth 1/2/3 =  98.8/ 77.1/ 80.5 ms
-> the nx/2 coarse Newton was indeed the map's cost center; bench
   defaults (BENCH_GRIDSEQ_DEPTH): 3 at nx >= 128, else 2 (the nx=8
   bottom grid at depth 3/nx=64 is latency-bound and regresses).
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

from applications.confusion import confusion_linear_observable, confusion_prior
from hippyflow_tpu.fem import (
    FunctionSpace,
    coarse_newton_warm_start,
    restrict_injection,
    unit_square_mesh,
)
from hippyflow_tpu.models.sampling import jit_lifted

NX = int(os.environ.get("PROBE_NX", 192))
B = int(os.environ.get("PROBE_BATCH", 32))
DEPTHS = [int(d) for d in os.environ.get("PROBE_DEPTHS", "1,2,3").split(",")]

print("devices:", jax.devices(), flush=True)
vel = np.load(os.path.join(REPO, ".bench", f"ns_velocity_nx{NX}.npy"))
obs, Vh = confusion_linear_observable(nx=NX, velocity=vel)
prior = confusion_prior(Vh)
problem = obs.problem

# chain of 2x-coarser problems on the restricted velocity
chain = []  # [(problem, V)] from nx/2 downward
V_prev, vel_prev, nx_prev = Vh, jnp.asarray(vel), NX
while nx_prev % 2 == 0 and nx_prev // 2 >= 8 and len(chain) < max(DEPTHS):
    V_c = FunctionSpace(unit_square_mesh(nx_prev // 2))
    vel_c = restrict_injection(vel_prev, V_prev, V_c)
    obs_c, _ = confusion_linear_observable(
        nx=nx_prev // 2, velocity=np.asarray(vel_c)
    )
    chain.append((obs_c.problem, V_c))
    V_prev, vel_prev, nx_prev = V_c, vel_c, nx_prev // 2

noise = jax.random.normal(
    jax.random.PRNGKey(0), (B, prior.noise_dim), dtype=jnp.float32
)
noise_ex = jax.ShapeDtypeStruct(noise.shape, noise.dtype)

# fine Newton stage, shared across depths (u0 quality is tolerance-equal)
m_ex = jax.ShapeDtypeStruct((B, Vh.dim), noise.dtype)
u_ex = jax.ShapeDtypeStruct((B, Vh.dim), noise.dtype)
solve = jit_lifted(
    jax.vmap(lambda m, u: problem.solve_fwd(m, u0=u)), m_ex, u_ex
)
ms = jit_lifted(jax.vmap(prior.sample), noise_ex)(noise)
jax.block_until_ready(ms)

for depth in DEPTHS:
    if depth > len(chain):
        print(f"depth {depth}: chain too short ({len(chain)})", flush=True)
        continue
    cws = coarse_newton_warm_start(
        prior, chain[0][0], Vh, chain[0][1], coarser_levels=chain[1:depth]
    )
    jcws = jit_lifted(cws, noise_ex)
    u0 = jcws(noise)
    jax.block_until_ready(u0)
    t0 = time.time()
    iters = 3
    for _ in range(iters):
        u0 = jcws(noise)
        jax.block_until_ready(u0)
    t_map = (time.time() - t0) / iters
    u, info = solve(ms, u0)
    jax.block_until_ready(u)
    it = np.asarray(info.iterations)
    print(
        f"depth {depth}: map {t_map * 1e3:8.1f} ms /{B}  fine iters "
        f"max={it.max()} mean={it.mean():.2f}  converged "
        f"{np.asarray(info.converged).sum()}/{B}",
        flush=True,
    )
