"""Forward-chunk sizing for the helmholtz lane (ordered P2 split-complex,
s=516, nb=52): the auto memory heuristic picks chunk 4-8, far below the
~256-lane saturation point measured at nx=64 — does a larger chunk buy
near-linear throughput here, or does the s=516 working set thrash HBM?

Uses the real lane path (sample_until_solved) so the persistent compile
cache from the bench runs applies.
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
from hippyflow_tpu.models.sampling import sample_until_solved
from hippyflow_tpu.utils import KeyChain

NX = int(os.environ.get("PROBE_NX", 64))
N = int(os.environ.get("PROBE_N", 32))
CHUNKS = [int(c) for c in os.environ.get("PROBE_CHUNKS", "4,8,16").split(",")]

print("devices:", jax.devices(), flush=True)
obs, Vh = helmholtz_linear_observable(nx=NX, frequency=600.0)
prior = helmholtz_prior(Vh)

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
