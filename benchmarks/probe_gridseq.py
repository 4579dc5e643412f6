"""On-chip A/B of grid-sequenced Newton warm starts (fem/multigrid.py).

The forward sampling stage is the largest slice of every bench lane
(VERDICT r4 weak items 1/2).  Grid sequencing replaces the zero initial
guess with the interpolant of each sample's own half-resolution solution:

    cold:     u0 = 0,            fine Newton to tolerance
    gridseq:  coarse Newton at nx/2 on the restricted (m, velocity),
              prolong, fine Newton from there

This probe measures both pipelines end to end (the gridseq figure INCLUDES
the coarse solve + transfer cost) plus iteration counts.

    PROBE_NX=64 PROBE_BATCH=256 python benchmarks/probe_gridseq.py
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

NX = int(os.environ.get("PROBE_NX", 64))
B = int(os.environ.get("PROBE_BATCH", 256))

print("devices:", jax.devices())
vel_path = os.path.join(REPO, ".bench", f"ns_velocity_nx{NX}.npy")
vel = np.load(vel_path) if os.path.exists(vel_path) else "analytic"
obs, Vh = confusion_linear_observable(nx=NX, velocity=vel)
# coarse problem: restrict the SAME velocity field (no second NS solve)
if isinstance(vel, str):
    vel_c = vel
else:
    Vc_tmp = FunctionSpace(unit_square_mesh(NX // 2))
    vel_c = np.asarray(restrict_injection(jnp.asarray(vel), Vh, Vc_tmp))
obs_c, Vc = confusion_linear_observable(nx=NX // 2, velocity=vel_c)
prior = confusion_prior(Vh)
problem = obs.problem
cws = coarse_newton_warm_start(prior, obs_c.problem, Vh, Vc)
n = Vh.dim
print(f"nx={NX} n={n} coarse n={Vc.dim} batch={B}")

from hippyflow_tpu.models.sampling import jit_lifted

noise = jax.random.normal(jax.random.PRNGKey(0), (B, n), dtype=jnp.float32)
noise_ex = jax.ShapeDtypeStruct(noise.shape, noise.dtype)
ms = jit_lifted(jax.vmap(prior.sample), noise_ex)(noise)
jax.block_until_ready(ms)


def timed(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:44s} {dt * 1e3:9.1f} ms")
    return out, dt


def report(tag, infos):
    it = np.asarray(infos.iterations)
    conv = np.asarray(infos.converged)
    print(
        f"  {tag}: converged {conv.sum()}/{B}  iters max={it.max()} "
        f"mean={it.mean():.2f}  resid max="
        f"{np.asarray(infos.residual_norm).max():.3e}"
    )
    return it


# jit_lifted (closure-convert) keeps the nx=192 mesh/coefficient tables out
# of the HLO payload -- a plain jax.jit inlines ~100 MB of constants here,
# which the remote-compile tunnel cannot digest (sampling.py:72-89)
m_ex = jax.ShapeDtypeStruct(ms.shape, ms.dtype)
u_ex = jax.ShapeDtypeStruct((B, n), ms.dtype)
solve = jit_lifted(
    jax.vmap(lambda m, u: problem.solve_fwd(m, u0=u)), m_ex, u_ex
)
z0 = jnp.zeros((B, n), dtype=ms.dtype)

(u_cold, info_cold), t_cold = timed("cold Newton (u0=0)", solve, ms, z0)
report("cold", info_cold)

jcws = jit_lifted(cws, noise_ex)
(u0_only, t_cws) = timed("coarse solve + prolong (warm-start map)", jcws, noise)
(u_warm, info_warm), t_warm = timed("fine Newton from gridseq u0", solve, ms, u0_only)
report("warm", info_warm)

du = float(jnp.max(jnp.linalg.norm(u_warm - u_cold, axis=1)))
print(
    f"RESULT nx={NX} cold_ms={t_cold * 1e3:.1f} "
    f"gridseq_ms={(t_cws + t_warm) * 1e3:.1f} "
    f"(coarse {t_cws * 1e3:.1f} + fine {t_warm * 1e3:.1f}) "
    f"speedup={t_cold / (t_cws + t_warm):.2f}x  max|du|={du:.2e}"
)
