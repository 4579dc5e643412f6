"""Jacobian-materialization stage cost at nx=64 (the post-adjoint-only
split): time materialize_jacobians for N samples at several chunk sizes.
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

NX = int(os.environ.get("PROBE_NX", 64))
N = int(os.environ.get("PROBE_N", 1024))
CHUNKS = [int(c) for c in os.environ.get("PROBE_CHUNKS", "256,512").split(",")]

print("devices:", jax.devices(), flush=True)
vel = np.load(os.path.join(REPO, ".bench", f"ns_velocity_nx{NX}.npy"))
obs, Vh = confusion_linear_observable(nx=NX, velocity=vel)
prior = confusion_prior(Vh)

s = sample_until_solved(obs, prior, KeyChain(0), N, chunk_size=min(256, N))
jax.block_until_ready(s.us)
print(f"sampled {N} at nx={NX}", flush=True)

for c in CHUNKS:
    t0 = time.time()
    J = materialize_jacobians(obs, s.ms, s.us, chunk_size=c)
    jax.block_until_ready(J)
    t_warm = time.time() - t0
    t0 = time.time()
    J = materialize_jacobians(obs, s.ms, s.us, chunk_size=c)
    jax.block_until_ready(J)
    dt = time.time() - t0
    print(
        f"jac chunk {c:4d}: {dt:7.3f}s for {N} samples "
        f"(warm {t_warm:.1f}s)  J{J.shape} |J|max={float(abs(J).max()):.3e}",
        flush=True,
    )
