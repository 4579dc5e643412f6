"""Forward-chunk sizing at nx=192: is the Newton solve still latency-bound
at chunk 16, i.e. does chunk 32 buy near-2x?

Uses the real lane path (sample_until_solved with the cached NS velocity)
so the persistent compile cache from the bench runs applies.
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
from hippyflow_tpu.models.sampling import sample_until_solved
from hippyflow_tpu.utils import KeyChain

NX = 192
N = int(os.environ.get("PROBE_N", 64))
CHUNKS = [int(c) for c in os.environ.get("PROBE_CHUNKS", "16,32").split(",")]

print("devices:", jax.devices(), flush=True)
vel = np.load(os.path.join(REPO, ".bench", f"ns_velocity_nx{NX}.npy"))
obs, Vh = confusion_linear_observable(nx=NX, velocity=vel)
prior = confusion_prior(Vh)

for c in CHUNKS:
    # warm (compile) pass
    t0 = time.time()
    s = sample_until_solved(obs, prior, KeyChain(0), N, chunk_size=c)
    jax.block_until_ready(s.us)
    t_warm = time.time() - t0
    # timed pass
    t0 = time.time()
    s = sample_until_solved(obs, prior, KeyChain(1), N, chunk_size=c)
    jax.block_until_ready(s.us)
    dt = time.time() - t0
    print(
        f"chunk {c:3d}: {dt:7.2f}s for {N} samples "
        f"({dt / N * 1e3:.1f} ms/sample, warm pass {t_warm:.1f}s, "
        f"failures {s.n_failures})",
        flush=True,
    )
