"""Chunk sizing for the FUSED helmholtz forward+Jacobian pass
(`sampling.sample_and_materialize_symmetric`): one adjoint-only
factorization per sample now serves both solves, so the per-sample live
set is roughly half the staged path's — does chunk 32 fit (it OOM'd the
staged path) and does it beat the measured chunk-16 lane (2.59 s / 32)?

Uses the real lane path so the persistent compile cache from bench runs
applies.

Measured results (v5e over the axon tunnel, 32 samples):
  * chunk 16, refine 1: 2.48-2.49 s, 0 failures across seeds 0-3 (the
    refine sweep is what makes the f32 convergence flag robust — without
    it seed 1 flagged 4/32 and resampling blew the pass up to 11.8 s).
  * chunk 16, refine 1, solver=thomas_inv: 2.07-2.10 s, 0 failures
    across seeds 1-4 — 19% under the CR-adjoint split.  At s=516 x
    nb=52 the 52 scan steps are MXU-sized (chunk,516,516) matmuls and
    one factor set serves fwd+trans; CR pays a separate transposed-band
    factorization plus temp copies.  Now the 'auto' pick at this
    geometry (pde_problem.py: s >= 128 or nb <= 64 -> thomas_inv;
    probe_jac192.py confirms the rule at s=193 x nb=193).
  * chunk 32: XLA OOM — 31.2 G HBM vs 15.75 G (CR temp copies).
  * NEGATIVE: folding the forward rhs into the Jacobian block as one
    (1+dQ)-column trans-solve measured SLOWER (2.59-2.60 s): the
    concatenate with the per-sample b makes the 21 MB B^T block a
    per-sample value instead of a loop-invariant constant, adding
    ~340 MB of HBM traffic per chunk.  Keep the separate 1-rhs solves.
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

from applications.helmholtz import helmholtz_linear_observable, helmholtz_prior
from hippyflow_tpu.models.sampling import sample_and_materialize_symmetric
from hippyflow_tpu.utils import KeyChain

NX = int(os.environ.get("PROBE_NX", 64))
N = int(os.environ.get("PROBE_N", 32))
CHUNKS = [int(c) for c in os.environ.get("PROBE_CHUNKS", "16,32").split(",")]
SEEDS = [int(s) for s in os.environ.get("PROBE_SEEDS", "0,1").split(",")]
REFINE = int(os.environ.get("PROBE_REFINE", "1"))
# adjoint-factorization solver: the auto split (CR-adjoint) was measured at
# s=65 x nb=577 (confusion); helmholtz is s=516 x nb=52 where the sequential
# depth penalty of Thomas is 52 steps of MXU-sized (chunk,516,516) matmuls
SOLVER = os.environ.get("PROBE_SOLVER", "")

print("devices:", jax.devices(), flush=True)
kw = {"solver": SOLVER} if SOLVER else {}
obs, Vh = helmholtz_linear_observable(nx=NX, frequency=600.0, **kw)
prior = helmholtz_prior(Vh)
print(f"solver={SOLVER or 'auto'} refine={REFINE}", flush=True)

for c in CHUNKS:
    first = True
    for seed in SEEDS:
        try:
            t0 = time.time()
            s, Js = sample_and_materialize_symmetric(
                obs, prior, KeyChain(seed), N, chunk_size=c,
                refine_steps=REFINE,
            )
            jax.block_until_ready(Js)
            dt = time.time() - t0
        except Exception as e:  # noqa: BLE001 — report OOM/compile per chunk
            print(f"chunk {c:3d}: FAILED: {type(e).__name__}: {e}", flush=True)
            break
        tag = " (warm/compile)" if first else ""
        print(
            f"chunk {c:3d} seed {seed}: {dt:7.2f}s for {N} samples "
            f"({dt / N * 1e3:.1f} ms/sample, failures {s.n_failures})"
            f"{tag}",
            flush=True,
        )
        first = False
