"""Fused Pallas banded back-solve vs the XLA scan (VERDICT r4 item 4).

The Jacobian stage's dQ-rhs adjoint solves are latency-bound under the XLA
scan: 2*nb tiny dispatches per solve, the (batch, s, k) carry round-tripping
HBM each step.  `ops/pallas_kernels.banded_solve_batch` fuses each sweep
into one kernel (carry VMEM-resident, factor blocks streamed).  This probe
measures, on the real lane geometries:

  phase micro — synthetic inverse-Thomas factors: scan vs pallas trans-solve
                wall-clock + parity, at (s=65, nb=65, k=100, B=256) [nx=64]
                and (s=193, nb=193, k=128, B=16) [nx=192].
  phase stage — materialize_jacobians on real confusion samples across
                solver in {auto, thomas_inv} x pallas in {off, auto}.

Run alone (single-tenant tunnel):  python benchmarks/probe_pallas_band.py

Measured results (v5e over the axon tunnel, 2026-08-20):
  micro nx64-shape  (B=256): scan 27.4 s  pallas 0.026 s (1070x), parity 0
  micro nx192-shape (B=16):  scan 0.130 s pallas 0.026 s (5.1x); the 2e-1
        micro "parity" is an artifact of the NON-diagonally-dominant
        synthetic band (0.3-noise off-diagonals at s=193 give a huge
        no-pivot growth factor); on REAL FEM factors below parity is
        2.7e-07 (f32 roundoff).
  stage nx=64  N=256: auto/CR 0.341 s | thomas off 0.215 s | thomas
        pallas 0.211 s -> thomas_inv beats CR 1.6x for materialize at
        s=65 too (the old 12 s/1024 probe_thomas scan number does not
        reproduce inside the fused materialize program); pallas == scan
        within noise there (chunk 256 keeps the scan's batched matmuls
        large enough).
  stage nx=192 N=64: all four configs 1.31 s (auto == thomas); pallas
        1.309 vs scan 1.316 — the stage is NOT solve-bound; the
        factorization dominates (see probe_jac_stages at nx=192).
Conclusions: (a) kernel correct at both geometries; (b) the lane-level
win at nx=64 comes from switching the auto adjoint to thomas_inv
(pde_problem auto rule updated); (c) the remaining nx=192 frontier is
the FACTORIZATION, not the back-solve.
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

from hippyflow_tpu import config as hf_config
from hippyflow_tpu.ops.pallas_kernels import banded_solve_batch
from hippyflow_tpu.ops.structured import (
    _thomas_solve_scan,
    factorize_thomas_inv_banded,
)

print("devices:", jax.devices(), flush=True)


def _synthetic_factors(B, nb, s, k, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    # diagonally dominant band: D = 4I + noise, off-diagonals small
    D = 4.0 * jnp.eye(s) + 0.3 * jax.random.normal(k1, (B, nb, s, s))
    L = 0.3 * jax.random.normal(k2, (B, nb, s, s))
    Bb = 0.3 * jax.random.normal(k3, (B, nb, s, s))
    L = L.at[:, 0].set(0.0)
    Bb = Bb.at[:, -1].set(0.0)
    band = jnp.concatenate([L, D, Bb], axis=3)  # (B, nb, s, 3s)
    facs = jax.jit(jax.vmap(factorize_thomas_inv_banded))(band)
    rhs = jax.random.normal(jax.random.PRNGKey(9), (B, nb, s, k))
    return facs, rhs


def _time(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    # scalar readback to defeat any async tail (measurement rules)
    float(jnp.sum(out))
    return (time.time() - t0) / n, out


def micro(B, nb, s, k, label):
    facs, rhs = _synthetic_factors(B, nb, s, k)
    scan = jax.jit(
        jax.vmap(lambda M, D, Bb, r: _thomas_solve_scan(M, D, Bb, r, True))
    )
    pal = jax.jit(lambda M, D, Bb, r: banded_solve_batch(M, D, Bb, r, True))
    t_scan, x_scan = _time(scan, facs.M, facs.Dinv, facs.B, rhs)
    t_pal, x_pal = _time(pal, facs.M, facs.Dinv, facs.B, rhs)
    par = float(jnp.max(jnp.abs(x_scan - x_pal)) / jnp.max(jnp.abs(x_scan)))
    print(
        f"micro {label}: scan {t_scan:.3f} s  pallas {t_pal:.3f} s  "
        f"({t_scan / t_pal:.1f}x), parity {par:.1e}",
        flush=True,
    )


def stage(nx, n_samples):
    from applications.confusion import confusion_linear_observable, confusion_prior
    from hippyflow_tpu.models.sampling import (
        materialize_jacobians,
        sample_until_solved,
    )
    from hippyflow_tpu.utils import KeyChain

    vel = np.load(os.path.join(REPO, ".bench", f"ns_velocity_nx{nx}.npy"))
    results = {}
    for solver in ("auto", "thomas_inv"):
        obs, Vh = confusion_linear_observable(nx=nx, velocity=vel, solver=solver)
        prior = confusion_prior(Vh)
        batch = sample_until_solved(
            obs, prior, KeyChain(7), n_samples,
            # nx=192 forward chunks cap at 32 (Thomas factors ~250 MB/sample
            # live, bench.py nx192 lane note); nx=64 runs one full chunk
            chunk_size=min(n_samples, 32 if nx >= 128 else 256),
        )
        jax.block_until_ready(batch.us)
        for mode in ("off", "auto"):
            if solver == "auto" and mode == "auto" and (
                obs.problem._structured_solver != "thomas_inv"
            ):
                # pallas routing only lives on InverseThomasFactor
                mode_label = "off(CR)"
            else:
                mode_label = mode
            prev = hf_config.set_pallas_band_solve(mode)
            try:
                jc = 16 if nx >= 128 else n_samples
                t0 = time.time()
                Js = materialize_jacobians(
                    obs, batch.ms, batch.us, None, chunk_size=jc
                )
                jax.block_until_ready(Js)
                t_first = time.time() - t0
                t0 = time.time()
                Js = materialize_jacobians(
                    obs, batch.ms, batch.us, None, chunk_size=jc
                )
                jax.block_until_ready(Js)
                t_warm = time.time() - t0
            finally:
                hf_config.set_pallas_band_solve(prev)
            key = (solver, mode_label)
            if key not in results:
                results[key] = (t_warm, np.asarray(Js))
                print(
                    f"stage nx={nx} N={n_samples} solver={solver} "
                    f"pallas={mode_label}: warm {t_warm:.3f} s "
                    f"(first {t_first:.1f} s)",
                    flush=True,
                )
    # parity across all configs
    ref = None
    for key, (t, Js) in results.items():
        if ref is None:
            ref, ref_key = Js, key
            continue
        err = np.max(np.abs(Js - ref)) / np.max(np.abs(ref))
        print(f"  parity {key} vs {ref_key}: {err:.2e}", flush=True)


if __name__ == "__main__":
    phases = os.environ.get("PROBE_PHASES", "micro,stage").split(",")
    if "micro" in phases:
        micro(256, 65, 65, 100, "nx64-shape  (B=256)")
        micro(16, 193, 193, 128, "nx192-shape (B=16)")
    if "stage" in phases:
        stage(64, int(os.environ.get("PROBE_N64", 256)))
        stage(192, int(os.environ.get("PROBE_N192", 64)))
