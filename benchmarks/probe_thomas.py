"""Can inverse-based block-Thomas beat cyclic reduction at nx=64, B=256?

Cyclic reduction costs ~16 s^3 flops per block row and measures ~184 ms
per factorization batch (issue-bound batched 65x65 matmuls, see
probe_cr2).  Classic Thomas costs 7 s^3/row but round 1 measured it
latency-bound: its scan stepped an XLA lu_factor per row.  This probe
re-times Thomas with the recurrence carried by EXPLICIT INVERSES
(Dinv' via the blocked Pallas GJ kernel, 2 batched matmuls per step),
so each scan step is three big batched ops over the 256-sample axis and
the sequential depth stays nb=65 INSIDE one compiled program.

    Dinv'_0 = inv(D_0)
    M_j     = A_j @ Dinv'_{j-1}          (L multiplier, stored)
    Dinv'_j = inv(D_j - M_j @ B_{j-1})   (stored)

Solve: y_j = b_j - M_j y_{j-1}; x_j = Dinv'_j (y_j - B_j x_{j+1}).
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
from hippyflow_tpu.ops.pallas_kernels import batched_inverse
from hippyflow_tpu.ops.structured import factorize_block_cyclic_banded

NX = int(os.environ.get("PROBE_NX", 64))
B = int(os.environ.get("PROBE_BATCH", 256))

print("devices:", jax.devices())
obs, Vh = confusion_linear_observable(nx=NX, velocity="analytic")
prior = confusion_prior(Vh)
problem = obs.problem
n = Vh.dim
s = problem._block_size
nb = n // s
print(f"nx={NX} n={n} s={s} nb={nb} batch={B}")

ms = jax.jit(prior.sample)(
    jax.random.normal(jax.random.PRNGKey(0), (B, n), dtype=jnp.float32))
us = jnp.zeros((B, n), dtype=jnp.float32)
asm = jax.jit(jax.vmap(lambda u, m: bc_symmetrize_banded_from_mask(
    problem.bound.assemble_A_banded(u, m, None, s), problem.bc)))
band = asm(us, ms)
jax.block_until_ready(band)


def timed(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:46s} {dt * 1e3:9.1f} ms")
    return out, dt


# ---- inverse-based Thomas, batch axis INSIDE each scan step ----------------
def thomas_inv_factorize(band_b):
    """band_b: (B, nb, s, 3s).  Returns (Minv (B,nb,s,s) multipliers,
    Dinv (B,nb,s,s)).  Scan over block rows; every step is batched over
    B on the 256-sample axis (Pallas GJ inverse + 2 matmuls)."""
    A = jnp.swapaxes(band_b[:, :, :, :s], 0, 1)  # (nb, B, s, s)
    D = jnp.swapaxes(band_b[:, :, :, s : 2 * s], 0, 1)
    Bb = jnp.swapaxes(band_b[:, :, :, 2 * s :], 0, 1)

    Dinv0 = batched_inverse(D[0])  # (B, s, s)

    def step(Dinv_prev, inputs):
        Dj, Aj, Bjm1 = inputs
        M = jnp.einsum("kij,kjl->kil", Aj, Dinv_prev)
        Dp = Dj - jnp.einsum("kij,kjl->kil", M, Bjm1)
        Dinv = batched_inverse(Dp)
        return Dinv, (M, Dinv)

    _, (Ms, Dinvs) = jax.lax.scan(step, Dinv0, (D[1:], A[1:], Bb[:-1]))
    Ms = jnp.concatenate([jnp.zeros_like(Dinv0)[None], Ms], axis=0)
    Dinvs = jnp.concatenate([Dinv0[None], Dinvs], axis=0)
    return jnp.swapaxes(Ms, 0, 1), jnp.swapaxes(Dinvs, 0, 1), Bb


def thomas_solve(Ms, Dinvs, Bb, rhs):
    """rhs: (B, n, k).  Forward/backward sweeps, batch inside each step."""
    Bq = rhs.shape[0]
    k = rhs.shape[-1]
    f = jnp.swapaxes(rhs.reshape(Bq, nb, s, k), 0, 1)  # (nb, B, s, k)
    Mt = jnp.swapaxes(Ms, 0, 1)
    Dt = jnp.swapaxes(Dinvs, 0, 1)

    def fwd(y_prev, inputs):
        fj, Mj = inputs
        yj = fj - jnp.einsum("kij,kjl->kil", Mj, y_prev)
        return yj, yj

    y0 = f[0]
    _, ys = jax.lax.scan(fwd, y0, (f[1:], Mt[1:]))
    ys = jnp.concatenate([y0[None], ys], axis=0)

    def bwd(x_next, inputs):
        yj, Bj, Dij = inputs
        xj = jnp.einsum(
            "kij,kjl->kil", Dij,
            yj - jnp.einsum("kij,kjl->kil", Bj, x_next))
        return xj, xj

    x_last = jnp.einsum("kij,kjl->kil", Dt[-1], ys[-1])
    _, xs = jax.lax.scan(
        bwd, x_last, (ys[:-1], Bb[:-1], Dt[:-1]), reverse=True)
    xs = jnp.concatenate([xs, x_last[None]], axis=0)
    return jnp.swapaxes(xs, 0, 1).reshape(Bq, nb * s, k)


fac_cr = jax.jit(jax.vmap(
    lambda b: factorize_block_cyclic_banded(b, with_transpose=False)))
F0, t_cr = timed("CR factorization (reference)", fac_cr, band)

fac_th = jax.jit(thomas_inv_factorize)
(Ms, Dinvs, Bb), t_th = timed("inverse-Thomas factorization", fac_th, band)

rhs = jax.random.normal(jax.random.PRNGKey(2), (B, n, 1), dtype=jnp.float32)
sol_cr = jax.jit(jax.vmap(lambda f, r: f.solve(r)))
X0, t_scr = timed("CR solve (1 rhs)", sol_cr, F0, rhs)
sol_th = jax.jit(thomas_solve)
X1, t_sth = timed("inverse-Thomas solve (1 rhs)", sol_th, Ms, Dinvs, Bb, rhs)

err = float(jnp.abs(X1 - X0).max() / jnp.abs(X0).max())
print(f"solution rel err thomas vs CR: {err:.2e}")
print(f"fac speedup {t_cr / t_th:.2f}x, solve speedup {t_scr / t_sth:.2f}x")
