"""Does MXU-aligned re-blocking speed up the banded Newton factorization?

The native confusion band at nx=64 has s=65 blocks (nx+1) — misaligned
with the 128-lane MXU.  The scalar bandwidth of the P1 operator is only
nx+2=66, so the SAME row-major dof ordering regrouped into blocks of
S=128 stays block-tridiagonal with half the block rows: ~3.9x more flops
but every matmul and inverse is lane-aligned.  This probe times the
PRODUCTION composite (assemble + bc + CR-factorize) and a 128-column
solve at s=65 vs direct-assembled S=128, and checks solutions agree.

Timing: block_until_ready on >=100ms composites (per the axon notes,
reliable at that scale; per-iteration scalar readbacks add a ~390ms
tunnel round-trip and must NOT be used here).
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
from hippyflow_tpu.fem import bc_symmetrize_banded_from_mask
from hippyflow_tpu.fem.assembly import bc_symmetrize_banded_masked
from hippyflow_tpu.fem.band_order import (
    BandOrder,
    ordered_band_indices,
    ordered_band_mask,
)
from hippyflow_tpu.ops.structured import factorize_block_cyclic_banded

NX = int(os.environ.get("PROBE_NX", 64))
B = int(os.environ.get("PROBE_BATCH", 256))
NRHS = int(os.environ.get("PROBE_NRHS", 128))

print("devices:", jax.devices())
obs, Vh = confusion_linear_observable(nx=NX, velocity="analytic")
prior = confusion_prior(Vh)
problem = obs.problem
n = Vh.dim
s0 = problem._block_size
nb0 = n // s0
print(f"nx={NX} n={n} s0={s0} nb0={nb0} batch={B} nrhs={NRHS}")

key = jax.random.PRNGKey(0)
ms = jax.jit(prior.sample)(jax.random.normal(key, (B, n), dtype=jnp.float32))
us = jnp.zeros((B, n), dtype=jnp.float32)


def timed(name, fn, *args, iters=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:48s} {dt * 1e3:9.1f} ms")
    return out, dt


# ---- native s=65 production composite --------------------------------------
def fac65(u, m):
    band = problem.bound.assemble_A_banded(u, m, None, s0)
    band = bc_symmetrize_banded_from_mask(band, problem.bc)
    return factorize_block_cyclic_banded(band, with_transpose=False)


fac65j = jax.jit(jax.vmap(fac65))
F0, t_fac0 = timed(f"assemble+bc+CR-fac s={s0}", fac65j, us, ms)
rhs = jax.random.normal(jax.random.PRNGKey(2), (B, n, NRHS), dtype=jnp.float32)
sol0 = jax.jit(jax.vmap(lambda f, r: f.solve(r)))
X0, t_sol0 = timed(f"CR solve s={s0} ({NRHS} rhs)", sol0, F0, rhs)

# ---- direct-assembled S=128 composite --------------------------------------
S = 128
NB = -(-n // S)
N_pad = NB * S
border = BandOrder(np.arange(n), np.arange(n), S, NB, n)
idx128 = jnp.asarray(ordered_band_indices(np.asarray(problem.bound.cells), border))
mask128 = jnp.asarray(ordered_band_mask(np.asarray(problem.bc.mask), border))
i_flat = np.arange(N_pad)
padrow = jnp.asarray((i_flat >= n).reshape(NB, S))
eye3 = jnp.concatenate(
    [jnp.zeros((S, S)), jnp.eye(S), jnp.zeros((S, S))], axis=1
).astype(jnp.float32)


def fac128(u, m):
    k = jax.jacfwd(problem.bound._r_elem, argnums=0)
    A_e = problem.bound._per_cell(k, u, m, None)
    flat = jax.ops.segment_sum(
        A_e.reshape(-1), idx128, num_segments=NB * S * 3 * S)
    band = flat.reshape(NB, S, 3 * S)
    band = bc_symmetrize_banded_masked(band, mask128)
    band = jnp.where(padrow[:, :, None], eye3, band)
    return factorize_block_cyclic_banded(band, with_transpose=False)


fac128j = jax.jit(jax.vmap(fac128))
F1, t_fac1 = timed("assemble+bc+CR-fac S=128 (direct)", fac128j, us, ms)
rhs128 = jnp.concatenate([rhs, jnp.zeros((B, N_pad - n, NRHS), rhs.dtype)], axis=1)
sol1 = jax.jit(jax.vmap(lambda f, r: f.solve(r)))
X1, t_sol1 = timed(f"CR solve S=128 ({NRHS} rhs)", sol1, F1, rhs128)

err = float(jnp.abs(X1[:, :n] - X0).max() / jnp.abs(X0).max())
print(f"solution rel err S=128 vs s=65: {err:.2e}")
print(f"fac speedup {t_fac0 / t_fac1:.2f}x, solve speedup {t_sol0 / t_sol1:.2f}x")
