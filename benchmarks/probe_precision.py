"""On-chip A/B of matmul precision for the banded-solver hot stages.

Round-4 VERDICT item 1 (mixed precision): how much wall-clock do the
forward Newton solve and the dQ-rhs Jacobian trans-solve gain when the
factorization/solve matmuls drop from 'highest' (6-pass bf16 emulation of
f32) to 'high' (3-pass) or 'default' (single bf16 pass), and does Newton
still converge?  Run once per setting:

    PROBE_PREC=highest|high|default python benchmarks/probe_precision.py
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

PREC = os.environ.get("PROBE_PREC", "highest")  # session/global precision
SOLVER_PREC = os.environ.get("PROBE_SOLVER_PREC", "")  # banded-op precision
REFINE = int(os.environ.get("PROBE_REFINE", "0"))
jax.config.update("jax_default_matmul_precision", PREC)
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
DQ = int(os.environ.get("PROBE_DQ", 100))

if SOLVER_PREC or REFINE:
    from hippyflow_tpu import config as hf_config

    hf_config.set_solver_precision(SOLVER_PREC or None, REFINE)
    print(f"solver policy: prec={SOLVER_PREC or 'inherit'} refine={REFINE}")

print("devices:", jax.devices())
vel_path = os.path.join(REPO, ".bench", f"ns_velocity_nx{NX}.npy")
vel = np.load(vel_path) if os.path.exists(vel_path) else "analytic"
obs, Vh = confusion_linear_observable(nx=NX, velocity=vel)
prior = confusion_prior(Vh)
problem = obs.problem
n = Vh.dim
print(f"prec={PREC} nx={NX} n={n} batch={B}")

key = jax.random.PRNGKey(0)
noise = jax.random.normal(key, (B, n), dtype=jnp.float32)
ms = jax.jit(prior.sample)(noise)
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


# --- forward Newton ---------------------------------------------------------
fwd = jax.jit(jax.vmap(lambda m: problem.solve_fwd(m)))
(us, infos), t_fwd = timed("vmapped Newton forward", fwd, ms)
iters = np.asarray(infos.iterations)
conv = np.asarray(infos.converged)
print(
    f"  converged {conv.sum()}/{B}  iters max={iters.max()} "
    f"mean={iters.mean():.2f}  resid max={np.asarray(infos.residual_norm).max():.3e}"
)

# --- Jacobian stage: linearize (adj factor) + DQ-rhs trans solve -------------
Bmat = jax.random.normal(jax.random.PRNGKey(1), (DQ, n), dtype=jnp.float32)


def jac_stage(u, m):
    lin = problem.linearize(u, m, needs="adj")
    X = problem.solve_incremental(lin, Bmat.T, is_adj=True)
    return X


jac = jax.jit(jax.vmap(jac_stage))
X, t_jac = timed(f"linearize+trans-solve ({DQ} rhs)", jac, us, ms)

# accuracy of the trans solve: || A^T x - b ||_F / || b ||_F per sample,
# with the residual computed through the assembled band at highest precision
from hippyflow_tpu.fem import bc_symmetrize_banded_from_mask
from hippyflow_tpu.ops.structured import block_tridiag_matmat_trans


def resid_sample(u, m, Xs):
    with jax.default_matmul_precision("highest"):
        band = problem.bound.assemble_A_banded(u, m, None, problem._block_size)
        band = bc_symmetrize_banded_from_mask(band, problem.bc)
        keep = (~jnp.asarray(problem.bc.mask)).astype(Xs.dtype)
        Bk = Bmat.T * keep[:, None]
        R = block_tridiag_matmat_trans(band, Xs) - Bk
        return jnp.linalg.norm(R) / jnp.linalg.norm(Bk)


rr = jax.jit(jax.vmap(resid_sample))(us, ms, X)
print(f"  trans-solve rel residual: max={float(np.asarray(rr).max()):.3e}")

print(
    f"RESULT prec={PREC} solver={SOLVER_PREC or 'inherit'} refine={REFINE} "
    f"fwd_ms={t_fwd * 1e3:.1f} jac_ms={t_jac * 1e3:.1f} "
    f"iters_max={iters.max()} conv={conv.sum()}/{B}"
)
