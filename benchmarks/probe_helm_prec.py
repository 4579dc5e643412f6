"""Helmholtz-lane A/B: solver choice x matmul precision x refinement.

The helmholtz lane's two dominant stages (BENCH_r03: forward 2.21 s,
jacobian 2.69 s for 32 samples) both ride the ordered P2 split-complex band
(s=516, nb=52).  This probe times, at lane shapes:

  * the linear forward solve (assembly + fwd-only factorization + k=1
    back-solve) under thomas_inv vs block_cyclic,
  * the Jacobian stage (adj-only linearize + 200-rhs trans-solve + C^T),

under the mixed-precision policy (PROBE_SOLVER_PREC / PROBE_REFINE) and
chunk sizes (PROBE_CHUNK).  Accuracy: trans-solve residual through the
banded matvec at highest precision.

    PROBE_SOLVER=thomas_inv|block_cyclic PROBE_SOLVER_PREC=default \
    PROBE_REFINE=1 PROBE_CHUNK=8 python benchmarks/probe_helm_prec.py
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

SOLVER = os.environ.get("PROBE_SOLVER", "")
SOLVER_PREC = os.environ.get("PROBE_SOLVER_PREC", "")
REFINE = int(os.environ.get("PROBE_REFINE", "0"))
CHUNK = int(os.environ.get("PROBE_CHUNK", "8"))
NX = int(os.environ.get("PROBE_NX", 64))
N = int(os.environ.get("PROBE_N", 32))

if SOLVER_PREC or REFINE:
    from hippyflow_tpu import config as hf_config

    hf_config.set_solver_precision(SOLVER_PREC or None, REFINE)

from applications.helmholtz import helmholtz_linear_observable, helmholtz_prior
from hippyflow_tpu.models.sampling import (
    materialize_jacobians,
    sample_until_solved,
)
from hippyflow_tpu.utils import KeyChain

print("devices:", jax.devices(), flush=True)
kw = {"solver": SOLVER} if SOLVER else {}
obs, Vh = helmholtz_linear_observable(nx=NX, frequency=600.0, **kw)
prior = helmholtz_prior(Vh)
problem = obs.problem
print(
    f"solver={SOLVER or 'auto'} prec={SOLVER_PREC or 'inherit'} "
    f"refine={REFINE} chunk={CHUNK} state={problem.state_dim} "
    f"s={problem._block_size}",
    flush=True,
)

# warm pass (compiles)
t0 = time.time()
s = sample_until_solved(obs, prior, KeyChain(0), N, chunk_size=CHUNK)
jax.block_until_ready(s.us)
print(f"forward warm (compile+run): {time.time() - t0:.1f}s", flush=True)
t0 = time.time()
s = sample_until_solved(obs, prior, KeyChain(1), N, chunk_size=CHUNK)
jax.block_until_ready(s.us)
t_fwd = time.time() - t0
print(f"forward timed: {t_fwd:.2f}s ({t_fwd / N * 1e3:.1f} ms/sample)", flush=True)

t0 = time.time()
Js = materialize_jacobians(obs, s.ms, s.us, None, chunk_size=CHUNK)
jax.block_until_ready(Js)
print(f"jacobian warm (compile+run): {time.time() - t0:.1f}s", flush=True)
t0 = time.time()
Js = materialize_jacobians(obs, s.ms, s.us, None, chunk_size=CHUNK)
jax.block_until_ready(Js)
t_jac = time.time() - t0
print(f"jacobian timed: {t_jac:.2f}s ({t_jac / N * 1e3:.1f} ms/sample)", flush=True)

# J accuracy: compare a few J rows against matrix-free transpmult at
# highest precision through an exact (policy-off) factor
from hippyflow_tpu import config as hf_config

prev = hf_config.set_solver_precision(None, 0)
obs2, _ = helmholtz_linear_observable(nx=NX, frequency=600.0)
from hippyflow_tpu.models.jacobian import ObservableJacobian

lin = obs2.problem.linearize(s.us[0], s.ms[0], needs="adj")
J_ref = ObservableJacobian(obs2).materialize(lin)
hf_config.set_solver_precision(*prev)
err = float(jnp.abs(Js[0] - J_ref).max() / jnp.abs(J_ref).max())
print(f"J[0] max rel err vs exact: {err:.3e}", flush=True)

print(
    f"RESULT solver={SOLVER or 'auto'} prec={SOLVER_PREC or 'inherit'} "
    f"refine={REFINE} chunk={CHUNK} fwd_s={t_fwd:.2f} jac_s={t_jac:.2f} "
    f"Jerr={err:.3e}"
)
