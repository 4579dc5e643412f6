"""Where does materialize_jacobians' extra second go?  Compare the single-
program path (n == chunk) against the donated-slice accumulation path at
the same per-chunk batch.
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

NX = 64
print("devices:", jax.devices(), flush=True)
vel = np.load(os.path.join(REPO, ".bench", f"ns_velocity_nx{NX}.npy"))
obs, Vh = confusion_linear_observable(nx=NX, velocity=vel)
prior = confusion_prior(Vh)

s = sample_until_solved(obs, prior, KeyChain(0), 1024, chunk_size=256)
jax.block_until_ready(s.us)


def run(n, chunk, iters=3):
    ms, us = s.ms[:n], s.us[:n]
    J = materialize_jacobians(obs, ms, us, chunk_size=chunk)
    jax.block_until_ready(J)
    t0 = time.time()
    for _ in range(iters):
        J = materialize_jacobians(obs, ms, us, chunk_size=chunk)
        jax.block_until_ready(J)
    dt = (time.time() - t0) / iters
    print(f"n={n:5d} chunk={chunk:4d}: {dt:7.3f}s "
          f"({dt / (n / chunk) * 1e3:.0f} ms/chunk)", flush=True)


run(256, 256)   # single-program path
run(512, 256)   # 2-chunk accumulation
run(1024, 256)  # 4-chunk accumulation
