"""Does the axon remote-compile transport overlap concurrent XLA compiles
from one process?

Two structurally different programs sized to compile in ~10-30 s each are
compiled back-to-back (serial) and then two FRESH variants in two threads
(parallel), against a throwaway compile cache.  Speedup ~2x means the
remote service parallelizes; ~1x means it serializes (the precompile pass
is then harmless but useless over this transport); errors mean
`config.parallel_precompile` should default off for this backend.

Measured (v5e over the axon tunnel, 2026-08-19): see docstring updates.
"""

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
cache = tempfile.mkdtemp(prefix="jax_cache_probe_")
jax.config.update("jax_compilation_cache_dir", cache)
print("devices:", jax.devices(), " throwaway cache:", cache, flush=True)


def make_prog(n_layers: int, width: int, seed: int):
    """A seed-distinct chain of matmuls+nonlinearities (seed perturbs a
    constant so each variant lowers to a distinct HLO -> no cache hits)."""

    def f(x):
        c = jnp.float32(1.0 + 1e-6 * seed)
        for i in range(n_layers):
            x = jnp.tanh(x @ x.T * c) @ x + jnp.sin(x) * c
            x = x / (1.0 + jnp.abs(x).mean())
        return x.sum()

    return jax.jit(f)


N_LAYERS = int(os.environ.get("PROBE_LAYERS", 48))
WIDTH = int(os.environ.get("PROBE_WIDTH", 512))
x = jax.ShapeDtypeStruct((WIDTH, WIDTH), jnp.float32)

# serial pair
t0 = time.time()
for seed in (0, 1):
    make_prog(N_LAYERS, WIDTH, seed).lower(x).compile()
serial = time.time() - t0
print(f"serial 2 compiles: {serial:.1f}s", flush=True)

# parallel pair (fresh seeds -> fresh programs)
import concurrent.futures as cf

t0 = time.time()
with cf.ThreadPoolExecutor(max_workers=2) as ex:
    futs = [
        ex.submit(lambda s=s: make_prog(N_LAYERS, WIDTH, s).lower(x).compile())
        for s in (2, 3)
    ]
    for f in futs:
        f.result()
par = time.time() - t0
print(f"parallel 2 compiles: {par:.1f}s  (speedup {serial / par:.2f}x)", flush=True)
