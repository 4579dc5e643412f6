"""Adjoint-solver + chunk sizing for the nx=192 Jacobian stage.

The lane's Jacobian materialization (256 samples, jac chunk 16) runs
adjoint-only block cyclic reduction at s=193 — the solver split measured
at nx=64 (s=65), where CR's shallower recursion beat Thomas.  At s=193
the blocks are MXU-sized and the chunk is small, so the tradeoff may
flip: inverse-Thomas factorization is one scan of (chunk,193,193) bmms
with trans-solves through the same inverses.  This probe times
materialize_jacobians on identical (ms, us) across:

  solver in {auto (= CR adjoint), thomas_inv} x jac chunk in {8, 16}

Uses the real lane path + persistent compile cache; run strictly alone
(single-tenant tunnel).

Measured results (v5e, 64 samples, warm):
  auto (CR)   chunk 16: 1.51 s (23.6 ms/sample)   chunk 8: outlier 10.2 s
  thomas_inv  chunk 16: 1.31 s (20.5 ms/sample)   chunk 8: 1.60 s
-> the tradeoff flips at s=193 as predicted; 'auto' now picks thomas_inv
   for adjoint factorizations when s >= 128 or nb <= 64 (pde_problem.py),
   cutting the 256-sample lane's Jacobian stage ~0.8 s.
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
import numpy as np

from applications.confusion import confusion_linear_observable, confusion_prior
from hippyflow_tpu.models.sampling import (
    materialize_jacobians,
    sample_until_solved,
)
from hippyflow_tpu.utils import KeyChain

NX = int(os.environ.get("PROBE_NX", 192))
N = int(os.environ.get("PROBE_N", 64))
SOLVERS = os.environ.get("PROBE_SOLVERS", "auto,thomas_inv").split(",")
CHUNKS = [int(c) for c in os.environ.get("PROBE_CHUNKS", "16,8").split(",")]

vel = np.load(os.path.join(REPO, ".bench", f"ns_velocity_nx{NX}.npy"))
print("devices:", jax.devices(), flush=True)

obs0, Vh = confusion_linear_observable(nx=NX, velocity=vel)
prior = confusion_prior(Vh)
t0 = time.time()
s = sample_until_solved(obs0, prior, KeyChain(0), N, chunk_size=32)
jax.block_until_ready(s.us)
print(f"forward: {time.time() - t0:.1f}s for {N} samples "
      f"(failures {s.n_failures})", flush=True)

for solver in SOLVERS:
    obs, _ = confusion_linear_observable(nx=NX, velocity=vel, solver=solver)
    for c in CHUNKS:
        try:
            t0 = time.time()
            Js = materialize_jacobians(obs, s.ms, s.us, chunk_size=c)
            jax.block_until_ready(Js)
            warm = time.time() - t0
            t0 = time.time()
            Js = materialize_jacobians(obs, s.ms, s.us, chunk_size=c)
            jax.block_until_ready(Js)
            dt = time.time() - t0
        except Exception as e:  # noqa: BLE001 — report OOM/compile per config
            print(f"solver {solver:11s} chunk {c:3d}: FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        print(
            f"solver {solver:11s} chunk {c:3d}: {dt:7.2f}s for {N} samples "
            f"({dt / N * 1e3:.1f} ms/sample, warm {warm:.1f}s)",
            flush=True,
        )
