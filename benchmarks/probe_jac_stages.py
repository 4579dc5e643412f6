"""Sub-stage breakdown of the Jacobian materialization program at nx=64:
adjoint-only factorization vs dQ-rhs transpose solve vs applyCt (vjp).
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
from hippyflow_tpu.models.sampling import jit_lifted, sample_until_solved
from hippyflow_tpu.utils import KeyChain

NX = int(os.environ.get("PROBE_NX", 64))
B = int(os.environ.get("PROBE_B", 256))

print("devices:", jax.devices(), flush=True)
vel = np.load(os.path.join(REPO, ".bench", f"ns_velocity_nx{NX}.npy"))
obs, Vh = confusion_linear_observable(nx=NX, velocity=vel)
prior = confusion_prior(Vh)
problem = obs.problem

s = sample_until_solved(obs, prior, KeyChain(0), B, chunk_size=B)
jax.block_until_ready(s.us)
ms, us = s.ms, s.us
Bt = obs.B.dense().T  # (n, dQ)


def timed(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:44s} {dt * 1e3:9.1f} ms", flush=True)
    return dt


def lin_only(m, u):
    lin = problem.linearize(u, m, None, needs="adj")
    # force materialization of the factor leaves
    return jax.tree_util.tree_map(lambda x: x, lin.factor)


def lin_solve(m, u):
    lin = problem.linearize(u, m, None, needs="adj")
    return obs.solveAdjIncremental(lin, Bt)


def full(m, u):
    lin = problem.linearize(u, m, None, needs="adj")
    X = obs.solveAdjIncremental(lin, Bt)
    return -obs.applyCt(lin, X).T


m_ex = jax.ShapeDtypeStruct(ms.shape, ms.dtype)
u_ex = jax.ShapeDtypeStruct(us.shape, us.dtype)
f_lin = jit_lifted(jax.vmap(lin_only), m_ex, u_ex)
f_sol = jit_lifted(jax.vmap(lin_solve), m_ex, u_ex)
f_full = jit_lifted(jax.vmap(full), m_ex, u_ex)

t_lin = timed("linearize (adj-only factor)", f_lin, ms, us)
t_sol = timed("linearize + adjoint solve (dQ rhs)", f_sol, ms, us)
t_full = timed("full materialize (+ applyCt)", f_full, ms, us)
print(f"\nimplied: factor={t_lin * 1e3:.0f} ms, "
      f"solve={(t_sol - t_lin) * 1e3:.0f} ms, "
      f"applyCt={(t_full - t_sol) * 1e3:.0f} ms  (batch {B})", flush=True)
