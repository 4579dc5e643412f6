"""Stage profile of the Helmholtz banded path (ordered P2 split-complex).

Where does the helmholtz lane's time go (assembly vs factorization vs
solve at s=516, nb=52), and would the pivotless Gauss-Jordan inverse be
numerically safe on the INDEFINITE Helmholtz CR diagonal blocks (they are
not diagonally dominant like the confusion ones — measure, don't assume)?
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

from applications.helmholtz import helmholtz_linear_observable, helmholtz_prior

NX = int(os.environ.get("PROBE_NX", 64))
B = int(os.environ.get("PROBE_BATCH", 8))

print("devices:", jax.devices())
obs, Vh = helmholtz_linear_observable(nx=NX, frequency=600.0)
prior = helmholtz_prior(Vh)
problem = obs.problem
border = problem._band_order
s, nb = border.s, border.nb
print(f"nx={NX} state={problem.state_dim} s={s} nb={nb} dM={Vh.dim} batch={B}")

key = jax.random.PRNGKey(0)
ms = jax.jit(prior.sample_n, static_argnums=1)(key, B)
jax.block_until_ready(ms)


def timed(name, fn, *args, iters=4):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:48s} {dt * 1e3:9.1f} ms")
    return out, dt


from hippyflow_tpu.fem.assembly import bc_symmetrize_banded_masked

u0 = jnp.zeros((B, problem.state_dim), dtype=ms.dtype)


def asm(u, m):
    band = problem.bound.assemble_A_banded_ordered(u, m, None, border)
    return bc_symmetrize_banded_masked(band, problem._band_mask)


asmj = jax.jit(jax.vmap(asm))
band, t_asm = timed("ordered assembly + bc (s=516)", asmj, u0, ms)

from hippyflow_tpu.ops.structured import factorize_block_cyclic_banded

facj = jax.jit(jax.vmap(
    lambda b: factorize_block_cyclic_banded(b, with_transpose=False)))
F, t_fac = timed("CR factorization (no transpose)", facj, band)
facjT = jax.jit(jax.vmap(
    lambda b: factorize_block_cyclic_banded(b, with_transpose=True)))
FT, t_facT = timed("CR factorization (with transpose)", facjT, band)

rhs = jax.random.normal(jax.random.PRNGKey(2),
                        (B, nb * s, 8), dtype=ms.dtype)
solj = jax.jit(jax.vmap(lambda f, r: f.solve(r)))
X, t_sol = timed("CR solve (8 rhs)", solj, F, rhs)

# full forward solve for reference
fwd = jax.jit(jax.vmap(lambda m: problem.solve_fwd(m)[0]))
_, t_fwd = timed("full linear forward solve", fwd, ms)

flops = 2 * 7 * nb * s**3 * B
print(f"\nfactorization(no-T): {flops / t_fac / 1e12:.2f} TFLOP/s")

# ---- pivotless-GJ stability on the actual CR diagonal blocks ---------------
# collect level-0 odd diagonal blocks of one sample's band
b0 = band[0]
d_blocks = b0[1::2, :, s:2 * s]  # (n_odd, s, s) level-0 odd diagonals
from hippyflow_tpu.ops.pallas_kernels import batched_inverse

inv_lu = jnp.linalg.inv(d_blocks)
# force the Pallas GJ kernel even above the s<=256 default cutoff — the
# question here is numerical (pivotless GJ on INDEFINITE Helmholtz blocks),
# not which inverse is faster; interpret mode covers non-TPU backends
try:
    inv_gj = jax.block_until_ready(batched_inverse(d_blocks, force="pallas"))
    kind = "pallas-GJ(forced)"
except Exception as e:  # s=516 can exceed VMEM scratch on-chip
    print(f"pallas GJ at s={s} failed ({str(e)[:120]}); falling back to xla")
    inv_gj = batched_inverse(d_blocks)
    kind = "xla-inv"
I = jnp.eye(s, dtype=d_blocks.dtype)
res_lu = jnp.abs(jnp.einsum("kij,kjl->kil", d_blocks, inv_lu) - I).max()
res_gj = jnp.abs(jnp.einsum("kij,kjl->kil", d_blocks, inv_gj) - I).max()
print(f"inverse residual: xla-inv {float(res_lu):.2e}  {kind} {float(res_gj):.2e}")
