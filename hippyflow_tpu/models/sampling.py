"""Batched sampling of (m, u, q, J) with failure-masked resampling.

The reference draws prior samples and solves the PDE one at a time inside
try/except retry loops (`activeSubspaceProjector.py:359-381`,
`PODProjector.py:190-217`).  Exceptions cannot cross ``jit``, so here the
whole chunk solves in one vmapped/jitted call, each sample reports a
converged flag (NewtonInfo), and the *host* resamples only the failed lanes
with fresh keys — same recovery semantics, batched hot path.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from .jacobian import ObservableJacobian, ObservableControlJacobian
from .observable import LinearStateObservable


def _device_memory_budget_gb() -> float:
    """A quarter of the accelerator's HBM (factorizations are one of several
    live buffers: samples, Jacobians, probe blocks).  Fallbacks: ~30% of a
    16 GB chip when a TPU backend doesn't report memory (the axon tunnel
    device has no memory_stats), 2 GB on CPU."""
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return 0.25 * stats["bytes_limit"] / 1e9
    except Exception:
        pass
    return 4.8 if jax.default_backend() == "tpu" else 2.0


def auto_chunk_size(
    state_dim: int, dtype=None, memory_gb: float | None = None, problem=None
) -> int:
    """Largest power-of-two sample-batch whose factorizations fit the
    memory budget.

    Dense path: 3 n^2 bytes/sample (A + factor + slack).  Structured banded
    path (block-tridiagonal Thomas): ~16 n s bytes/sample (band + D/L/B +
    LU'd diagonal + solve temporaries) — n/s-fold smaller, so chunks grow by
    the same factor and the MXU sees far larger batched matmuls.

    Power-of-two rounding keeps chunk shapes stable across runs (compile
    cache hits) and near the measured latency-saturation point: on v5e the
    batched Newton chunk costs the same wall-clock at 113 as at 256 samples
    (latency-bound below ~256), so undersized chunks waste nearly 2x."""
    dtype = dtype or config.default_dtype()
    if memory_gb is None:
        memory_gb = _device_memory_budget_gb()
    itemsize = jnp.dtype(dtype).itemsize
    if problem is not None and getattr(problem, "_use_block_tridiag", False):
        per_sample = 16.0 * state_dim * problem._block_size * itemsize
    else:
        per_sample = 3.0 * state_dim * state_dim * itemsize
    n = max(1, min(4096, int(memory_gb * 1e9 / per_sample)))
    return 1 << (n.bit_length() - 1)


class _PolicyKeyedCache:
    """Dict view whose keys are extended with the global solver-precision
    policy (`config.set_solver_precision`).  The policy is trace-time state
    read inside factorize/solve, so a program traced under one policy must
    never be served under another — a bare key would silently reuse
    stale-precision executables after the policy changes (e.g. a per-lane
    bench knob restored on exit)."""

    __slots__ = ("_d",)

    def __init__(self, d):
        self._d = d

    def _k(self, key):
        return (key, config.solver_precision(), config.solver_refine_steps(),
                config.pallas_band_solve(), config.pallas_band_max_block())

    def __contains__(self, key):
        return self._k(key) in self._d

    def __getitem__(self, key):
        return self._d[self._k(key)]

    def __setitem__(self, key, value):
        self._d[self._k(key)] = value


_obj_token_counter = 0


def _obj_token(obj) -> int:
    """Monotonic identity token for cache keys.  `id()` of a live object can
    be reused after it is garbage-collected, so an id-keyed program cache
    could return an executable built for a DEAD prior/warm-start map whose
    address a new object happens to reuse.  The token is assigned once and
    travels with the object."""
    global _obj_token_counter
    tok = getattr(obj, "_hf_cache_token", None)
    if tok is None:
        _obj_token_counter += 1
        tok = _obj_token_counter
        try:
            obj._hf_cache_token = tok
        except (AttributeError, TypeError):
            # unsettable object (slots/builtin): fall back to id() and pin
            # the object alive via a module-level registry so the id cannot
            # be recycled.
            _obj_token_pins.append(obj)
            tok = id(obj)
    return tok


_obj_token_pins: list = []


def _jit_cache(obj):
    if not hasattr(obj, "_hf_jit_cache"):
        obj._hf_jit_cache = {}
    return _PolicyKeyedCache(obj._hf_jit_cache)


def jit_lifted(fn, *example_args, donate_argnums=()):
    """jit with closure constants lifted to arguments.

    jax inlines closure-captured arrays into the lowered HLO as literal
    constants; with the mesh tables, coefficient tables, band indices and
    prior bands captured by the FEM programs that is tens-to-hundreds of MB
    of HLO at large nx — enough to break remote-compile transports.
    `jax.closure_convert` extracts the captured arrays; passing them as call
    arguments keeps the compile payload small and the buffers shared.
    donate_argnums refers to fn's own positional arguments (the lifted
    consts are appended after them, so the positions are unchanged)."""
    converted, consts = jax.closure_convert(fn, *example_args)
    jfn = jax.jit(converted, donate_argnums=donate_argnums)
    box: dict = {}

    def call(*args):
        exe = box.get("exe")
        if exe is not None:
            try:
                return exe(*args, *consts)
            except Exception as e:
                # AOT executables are strict about shardings/devices; a
                # mismatched call (e.g. sharded arrays into a program
                # precompiled for one device) degrades to the jit path,
                # which specializes per input layout like any jit.  The
                # fallback is LOGGED, never silent: a genuine runtime
                # failure (RESOURCE_EXHAUSTED, a wedged tunnel device)
                # would otherwise be masked by minutes of hidden
                # recompilation before resurfacing.
                print(
                    "jit_lifted: AOT executable call failed "
                    f"({type(e).__name__}: {str(e)[:200]}); "
                    "falling back to the jit path (recompiles)."
                )
                box["exe"] = None
        return jfn(*args, *consts)

    def precompile():
        """AOT-compile at the example shapes (idempotent, thread-safe to
        run for DISTINCT programs concurrently).

        Cold compiles over the axon tunnel are the dominant warmup cost
        (minutes per Newton/GHEP program at nx=192); running several
        programs' `precompile` in parallel threads overlaps the remote
        XLA compiles, which the serial execute-to-compile warmup cannot
        (see `precompile_parallel`).  Skips when the jit path already
        compiled this program."""
        if "exe" not in box:
            try:
                if jfn._cache_size() > 0:  # already compiled via jit call
                    box["exe"] = None
                    return
            except Exception:
                pass
            box["exe"] = jfn.lower(*example_args, *consts).compile()

    call.precompile = precompile
    return call


def precompile_parallel(builders, verbose: bool = False, label: str = ""):
    """Build (trace) and AOT-compile independent programs concurrently.

    ``builders``: zero-arg callables, each returning a `jit_lifted` program
    (or anything / None — non-lifteds are just built).  Tracing runs in the
    worker threads too (jax trace state is thread-local), so a slow trace
    of one program does not serialize the others' compiles.

    Failures are non-fatal: a program whose precompile dies (e.g. the
    remote-compile transport dropping a request) simply compiles on its
    first real call, exactly as without this pass."""
    builders = [b for b in builders if b is not None]
    if not builders:
        return
    if len(builders) == 1 or not config.parallel_precompile():
        for b in builders:
            try:
                f = b()
                if hasattr(f, "precompile"):
                    f.precompile()
            except Exception as e:  # degrade to compile-on-first-call
                if verbose:
                    print(f"precompile{label} failed (non-fatal): {e!r}")
        return
    import concurrent.futures as cf

    def run(i, b):
        t0 = time.time()
        f = b()
        t1 = time.time()
        if hasattr(f, "precompile"):
            f.precompile()
        if verbose:
            # trace (python-side lowering, GIL-bound across threads) vs
            # compile (XLA backend / remote service, truly concurrent) —
            # the split that tells cold-start work where to go next
            print(
                f"precompile{label} builder {i}: trace {t1 - t0:.1f}s, "
                f"compile {time.time() - t1:.1f}s",
                flush=True,
            )

    with cf.ThreadPoolExecutor(max_workers=len(builders)) as ex:
        futs = [ex.submit(run, i, b) for i, b in enumerate(builders)]
        for fut in futs:
            try:
                fut.result()
            except Exception as e:  # degrade to compile-on-first-call
                if verbose:
                    print(f"precompile{label} failed (non-fatal): {e!r}")


@dataclass
class SampleBatch:
    """Solved forward samples. Arrays have leading sample axis."""

    ms: jax.Array  # (n, dM)
    us: jax.Array  # (n, n_state)
    qs: jax.Array  # (n, dQ)
    zs: jax.Array | None  # (n, dZ) or None
    n_failures: int
    # parameters whose forward solve did not converge (resampled lanes),
    # for the reference's skipped/-archive (`dataGenerator.py:232-241`)
    failed_ms: np.ndarray | None = None
    # with prefetch_host: the per-chunk (m, q, z|None) device arrays whose
    # host transfers were started as each chunk finalized — np.asarray on
    # these reuses the in-flight copy instead of re-fetching the
    # concatenated buffers
    host_chunks: list | None = None


def sample_until_solved(
    observable: LinearStateObservable,
    prior,
    keychain,
    n_samples: int,
    control_distribution=None,
    chunk_size: int | None = None,
    max_tries: int = 10,
    verbose: bool = False,
    collective=None,
    reset_initial_guess: bool = False,
    prefetch_host: bool = False,
    coarse_warm_start=None,
    precompile_only: bool = False,
) -> SampleBatch:
    """Draw n_samples prior samples with converged forward solves.

    ``coarse_warm_start`` (optional): a batched map ``noise -> u0`` built by
    :func:`hippyflow_tpu.fem.multigrid.coarse_newton_warm_start` — grid
    sequencing.  Each sample's Newton solve starts from the interpolant of
    its OWN coarse-mesh solution (measured on the v5e confusion problem:
    2 fine iterations instead of 5 at nx=64, 1 instead of 5 at nx=192 —
    1.35x/2.51x on the forward stage including the coarse solves,
    benchmarks/probe_gridseq.py).  Being a deterministic function of the
    sample's noise it preserves the bit-exact resume guarantee, so it
    composes with the chunk-resumable drivers; it takes precedence over
    the cross-chunk state carrying below.

    Failed lanes (non-converged Newton) are resampled with fresh noise, up to
    ``max_tries`` sweeps; a hard failure raises, mirroring the reference's
    100-iteration guard (`activeSubspaceProjector.py:211`).

    ``reset_initial_guess=False`` (the reference's default,
    `dataGenerator.py:31,132-135`) warm-starts each chunk's Newton solves
    from the previous chunk's converged states lane-by-lane — typically
    saving 1-2 Newton iterations per sample; ``True`` cold-starts every
    solve from zero.  Scope note: warm starting applies only WITHIN one
    ``sample_until_solved`` call (multiple internal chunks).  The
    chunk-resumable drivers (`DataGenerator.generate`,
    `PODProjector.generate_training_data`) issue one call per on-disk
    chunk and deliberately cold-start each: chunk files persist only
    (m, q[, z]), so carrying Newton states across resumable chunks would
    make a resumed run's iterates (and hence the stored states) differ
    bitwise from an uninterrupted run, breaking the bit-exact resume
    guarantee tested in `tests/test_resume_health.py`.

    With a DeviceCollective, each chunk's noise is sharded over the
    collective's 'sample' mesh axis before the batched solve, so the Newton
    solves (and everything downstream that keeps the leading sample axis)
    partition across devices — the TPU replacement for the reference's
    sample-parallel MPI rows (SURVEY.md section 5.8)."""
    problem = observable.problem
    dtype = prior.mean.dtype
    if chunk_size is None:
        chunk_size = auto_chunk_size(problem.state_dim, dtype, problem=problem)
        if collective is not None:
            # keep per-device batches at the single-device sweet spot
            chunk_size = min(4096, chunk_size * collective.size())
    shard = (lambda x: x) if collective is None else collective.shard_samples
    with_control = control_distribution is not None
    nonlinear = not getattr(problem, "is_fwd_linear", True)
    use_cws = coarse_warm_start is not None and nonlinear
    # grid sequencing supersedes cross-chunk state carrying: each lane gets
    # its own coarse-solution interpolant, which is both a better initial
    # guess and a pure function of the lane's noise (resume-safe)
    warm_start = not reset_initial_guess and nonlinear and not use_cws

    cache = _jit_cache(observable)

    cws_split = use_cws and hasattr(coarse_warm_start, "builders")

    def get_cws(b: int):
        if cws_split:
            # SplitWarmStartChain manages its own per-level jitted programs
            # (fem/multigrid.py); its builders feed precompile_parallel below
            return coarse_warm_start
        ck = ("cws", _obj_token(coarse_warm_start), b, str(dtype))
        if ck not in cache:
            noise_ex = jax.ShapeDtypeStruct((b, prior.noise_dim), dtype)
            cache[ck] = jit_lifted(coarse_warm_start, noise_ex)
        return cache[ck]

    def one(noise, z, u0=None):
        m = prior.sample(noise)
        u, info = problem.solve_fwd(m, z=z, u0=u0)
        q = observable.evalu(u)
        return m, u, q, info.converged

    def get_solve_chunk(b: int, with_u0: bool):
        ck = ("sample_solve", with_control, with_u0, _obj_token(prior), b,
              str(dtype))
        if ck not in cache:
            noise_ex = jax.ShapeDtypeStruct((b, prior.noise_dim), dtype)
            u0_ex = jax.ShapeDtypeStruct((b, problem.state_dim), dtype)
            if with_control:
                z_ex = jax.ShapeDtypeStruct(
                    (b, control_distribution.dim), dtype
                )
                if with_u0:
                    cache[ck] = jit_lifted(jax.vmap(one), noise_ex, z_ex, u0_ex)
                else:
                    lifted = jit_lifted(
                        jax.vmap(lambda n_, z_: one(n_, z_)), noise_ex, z_ex
                    )
                    wrap = lambda noise, z, u0: lifted(noise, z)
                    wrap.precompile = lifted.precompile
                    cache[ck] = wrap
            else:
                if with_u0:
                    lifted = jit_lifted(
                        jax.vmap(lambda n_, u_: one(n_, None, u_)),
                        noise_ex,
                        u0_ex,
                    )
                    wrap = lambda noise, z, u0: lifted(noise, u0)
                    wrap.precompile = lifted.precompile
                    cache[ck] = wrap
                else:
                    lifted = jit_lifted(
                        jax.vmap(lambda noise: one(noise, None)), noise_ex
                    )
                    wrap = lambda noise, z, u0: lifted(noise)
                    wrap.precompile = lifted.precompile
                    cache[ck] = wrap
        return cache[ck]

    def solve_chunk(noise, z, u0=None):
        return get_solve_chunk(noise.shape[0], u0 is not None)(noise, z, u0)

    # Builders for every program this call will need (full chunks + tail),
    # for threaded AOT pre-compilation.  Building draws NO noise, so the
    # PRNG stream — and hence the samples — are bitwise identical with or
    # without the precompile pass.  Skipped under a real collective: the
    # AOT executables are specialized to single-device layouts.
    single_device = collective is None or getattr(
        collective, "size", lambda: 1
    )() == 1
    sizes = {min(chunk_size, n_samples)}
    if n_samples > chunk_size and n_samples % chunk_size:
        sizes.add(n_samples % chunk_size)
    with_u0 = use_cws or warm_start
    builders = []
    for b in sorted(sizes, reverse=True):
        if cws_split:
            builders.extend(coarse_warm_start.builders(b, dtype))
        elif use_cws:
            builders.append(lambda b=b: get_cws(b))
        builders.append(lambda b=b: get_solve_chunk(b, with_u0))
    if precompile_only:
        return builders if single_device else []
    if single_device and len(builders) > 1 and config.parallel_precompile():
        precompile_parallel(builders, verbose=verbose, label="[forward]")

    # Stage 1: dispatch every chunk's batched solve without reading results —
    # async dispatch pipelines the host round trips (one sync per chunk costs
    # ~0.3s over a remote-TPU tunnel; one sync total is near-free).
    chunks = []
    remaining = n_samples
    u_prev = None
    while remaining > 0:
        b = min(chunk_size, remaining)
        noise = shard(keychain.normal((b, prior.noise_dim), dtype=dtype))
        z = None
        if with_control:
            z = shard(control_distribution.sample_n(keychain.next_key(), b))
        u0 = None
        if use_cws:
            # the fine solve reuses the SAME compiled with-u0 Newton program
            # as the warm-start path; only the (cheap, quarter-size) coarse
            # program is an extra compile
            u0 = get_cws(b)(noise)
        elif warm_start:
            # the first chunk cold-starts via an explicit zero initial
            # guess — bitwise-identical to u0=None (pde_problem.py:460-462)
            # but it reuses the SAME compiled warm-start program as every
            # later chunk, instead of compiling a second no-u0 Newton
            # variant (the Newton program is the most expensive compile:
            # several hundred seconds at nx=192 over the tunnel)
            if u_prev is not None and u_prev.shape[0] >= b:
                u0 = u_prev[:b]
            else:
                u0 = jnp.zeros((b, problem.state_dim), dtype=dtype)
        m, u, q, ok = solve_chunk(noise, z, u0)
        if warm_start:
            # sanitize the carried states: a diverged/failed lane must not
            # poison the same lane index in every later chunk (NaN initial
            # guesses never converge)
            good = ok[:, None] & jnp.all(jnp.isfinite(u), axis=1, keepdims=True)
            u_prev = jnp.where(good, u, 0.0)
        chunks.append([m, u, q, z, ok])
        remaining -= b
        if verbose:
            print(f"  dispatched {n_samples - remaining}/{n_samples}", flush=True)

    # Stage 2: one sync for all converged flags, then per-chunk resampling of
    # failed lanes only (rare: rough prior draws that broke Newton).
    ms_out, us_out, qs_out, zs_out = [], [], [], []
    failed_ms = []
    host_chunks = [] if prefetch_host else None
    n_failures = 0
    for m, u, q, z, ok in chunks:
        ok = np.asarray(ok)
        for _ in range(max_tries):
            if ok.all():
                break
            bad = np.where(~ok)[0]
            nbad = len(bad)
            n_failures += nbad
            failed_ms.append(np.asarray(m[bad]))
            if verbose:
                print(f"resampling {nbad} failed forward solves")
            # Resample at the chunk's OWN batch size and keep only the first
            # nbad lanes: an arbitrary-len(bad) batch would compile a fresh
            # Newton program (minutes over a remote-compile tunnel at large
            # nx) — a few wasted warm solves are orders of magnitude cheaper.
            # Passing an explicit zero initial guess reuses the warm-start
            # program instead of compiling a no-u0 variant.
            b_re = m.shape[0]
            noise2 = keychain.normal((b_re, prior.noise_dim), dtype=dtype)
            z2 = (
                control_distribution.sample_n(keychain.next_key(), b_re)
                if with_control
                else None
            )
            if use_cws:
                u0_2 = get_cws(b_re)(noise2)
            else:
                u0_2 = (
                    jnp.zeros((b_re, problem.state_dim), dtype=dtype)
                    if warm_start
                    else None
                )
            m2, u2, q2, ok2 = solve_chunk(noise2, z2, u0_2)
            m = m.at[bad].set(m2[:nbad])
            u = u.at[bad].set(u2[:nbad])
            q = q.at[bad].set(q2[:nbad])
            if with_control:
                z = z.at[bad].set(z2[:nbad])
            ok_np = ok.copy()
            ok_np[bad] = np.asarray(ok2[:nbad])
            ok = ok_np
        if not ok.all():
            raise RuntimeError(
                f"{(~ok).sum()} forward solves failed after {max_tries} resampling sweeps"
            )
        if prefetch_host:
            # start this chunk's (m, q) device->host transfers NOW — the
            # arrays are final once the convergence check passes, and the
            # remaining chunks are still executing, so the transfer rides
            # under their compute instead of serializing into the caller's
            # save stage (over a tunneled TPU the m-dataset transfer alone
            # is ~1 s at nx=64 N=1024)
            for arr in (m, q) if z is None else (m, q, z):
                try:
                    arr.copy_to_host_async()
                except Exception:
                    pass
            host_chunks.append((m, q, z))
        ms_out.append(m)
        us_out.append(u)
        qs_out.append(q)
        if with_control:
            zs_out.append(z)

    return SampleBatch(
        ms=jnp.concatenate(ms_out),
        us=jnp.concatenate(us_out),
        qs=jnp.concatenate(qs_out),
        zs=jnp.concatenate(zs_out) if with_control else None,
        n_failures=n_failures,
        failed_ms=np.concatenate(failed_ms) if failed_ms else None,
        host_chunks=host_chunks,
    )


def sample_and_materialize_symmetric(
    observable: LinearStateObservable,
    prior,
    keychain,
    n_samples: int,
    chunk_size: int | None = None,
    max_tries: int = 10,
    refine_steps: int = 1,
    verbose: bool = False,
    precompile_only: bool = False,
) -> tuple[SampleBatch, jax.Array]:
    """Fused forward + Jacobian sampling for LINEAR problems whose assembled
    operator is symmetric: A^T = A, possibly indefinite (the split-complex
    Helmholtz/PML form [[P, Q], [Q, -P]], `applications/helmholtz.py:98`).

    The staged AS pipeline assembles and factorizes each sample TWICE —
    once for the forward solve (solve_fwd), once for the dQ-rhs adjoint
    solve (linearize(needs='adj'), `materialize_jacobians`).  With A^T = A
    a single adjoint-only factorization serves both: u = A^{-T} b solved
    through the same factor that materializes J.  Measured on the
    helmholtz bench lane this halves the dominant per-sample
    assembly+factorization cost (the reference likewise reuses its
    per-sample LU across that sample's solves,
    `hippyflow/modeling/jacobian.py:117-139`).

    PRNG-stream compatible with `sample_until_solved` (same per-chunk
    normal draws), so fused and staged runs see identical parameters.
    Returns (SampleBatch, Js) with Js (n, dQ, dM).
    """
    problem = observable.problem
    assert problem.is_fwd_linear and problem.operator_symmetric
    assert not np.asarray(problem.bc.mask).any(), (
        "fused symmetric sampling supports no-Dirichlet problems (PML); "
        "Dirichlet rows break A^T = A after bc masking"
    )
    dtype = prior.mean.dtype
    if chunk_size is None:
        chunk_size = auto_chunk_size(problem.state_dim, dtype, problem=problem)
    J = ObservableJacobian(observable)
    cache = _jit_cache(observable)

    def one(noise):
        m = prior.sample(noise)
        zero = jnp.zeros(problem.state_dim, dtype=m.dtype)
        lin = problem.linearize(zero, m, None, needs="adj")
        b = problem.linear_rhs(m)
        u = problem.solve_incremental(lin, b, is_adj=True)  # A^T = A
        # fixed-precision iterative refinement through the SAME factor:
        # measured on the f32 TPU lane, raw trans-solve residuals cluster
        # AT the convergence tolerance (4/32 samples flagged at seed 1,
        # each flag costing a full resample sweep); one sweep drops the
        # backward error to ~eps and costs one 1-rhs solve + one matvec
        # against the 200-rhs Jacobian solve below (<1% of the chunk)
        for _ in range(refine_steps):
            r = problem.residual_masked(u, m, None)  # = A u - b (affine r)
            u = u - problem.solve_incremental(lin, r, is_adj=True)
        ok, _ = problem.linear_convergence_check(u, m, b)
        q = observable.evalu(u)
        # A is u-independent (linear) but C = dr/dm is NOT: rebind the
        # linearization point to the solved state, keeping the factor
        Jm = J.materialize(lin._replace(u=u))
        return m, u, q, Jm, ok

    def get_chunk_fn(b: int):
        ck = ("fused_sym", _obj_token(prior), b, str(dtype))
        if ck not in cache:
            noise_ex = jax.ShapeDtypeStruct((b, prior.noise_dim), dtype)
            cache[ck] = jit_lifted(jax.vmap(one), noise_ex)
        return cache[ck]

    # program builders (full chunk + tail) for threaded AOT pre-compilation;
    # building draws no noise, so the sample stream is unchanged
    sizes = {min(chunk_size, n_samples)}
    if n_samples > chunk_size and n_samples % chunk_size:
        sizes.add(n_samples % chunk_size)
    builders = [lambda b=b: get_chunk_fn(b) for b in sorted(sizes, reverse=True)]
    if precompile_only:
        return builders
    if len(builders) > 1 and config.parallel_precompile():
        precompile_parallel(builders, verbose=verbose, label="[fused]")

    # dispatch all chunks, then one sync on the converged flags (same
    # two-stage structure and failure semantics as sample_until_solved)
    chunks = []
    remaining = n_samples
    while remaining > 0:
        b = min(chunk_size, remaining)
        noise = keychain.normal((b, prior.noise_dim), dtype=dtype)
        chunks.append(list(get_chunk_fn(b)(noise)))
        remaining -= b
        if verbose:
            print(f"  dispatched {n_samples - remaining}/{n_samples}", flush=True)

    ms_o, us_o, qs_o, Js_o = [], [], [], []
    failed_ms = []
    n_failures = 0
    for m, u, q, Jm, ok in chunks:
        ok = np.asarray(ok)
        for _ in range(max_tries):
            if ok.all():
                break
            bad = np.where(~ok)[0]
            nbad = len(bad)
            n_failures += nbad
            failed_ms.append(np.asarray(m[bad]))
            if verbose:
                print(f"resampling {nbad} failed linear solves")
            b_re = m.shape[0]
            noise2 = keychain.normal((b_re, prior.noise_dim), dtype=dtype)
            m2, u2, q2, J2, ok2 = get_chunk_fn(b_re)(noise2)
            m = m.at[bad].set(m2[:nbad])
            u = u.at[bad].set(u2[:nbad])
            q = q.at[bad].set(q2[:nbad])
            Jm = Jm.at[bad].set(J2[:nbad])
            ok_np = ok.copy()
            ok_np[bad] = np.asarray(ok2[:nbad])
            ok = ok_np
        if not ok.all():
            raise RuntimeError(
                f"{(~ok).sum()} linear solves failed after {max_tries} sweeps"
            )
        ms_o.append(m)
        us_o.append(u)
        qs_o.append(q)
        Js_o.append(Jm)

    batch = SampleBatch(
        ms=jnp.concatenate(ms_o),
        us=jnp.concatenate(us_o),
        qs=jnp.concatenate(qs_o),
        zs=None,
        n_failures=n_failures,
        failed_ms=np.concatenate(failed_ms) if failed_ms else None,
    )
    return batch, jnp.concatenate(Js_o)


def materialize_jacobians(
    observable: LinearStateObservable,
    ms,
    us,
    zs=None,
    chunk_size: int | None = None,
    control: bool = False,
    precompile_only: bool = False,
):
    """Dense Jacobians J_i = dq/dm at each sample: (n, dQ, dM).

    ``precompile_only=True`` returns the list of program builders this call
    would compile (full chunk + tail) instead of executing — ``ms``/``us``/
    ``zs`` may then be `jax.ShapeDtypeStruct`s; used by
    `ActiveSubspaceProjector.precompile_programs` to overlap this stage's
    XLA compile with the forward and GHEP programs'.

    One batched linearization (factorize) + one blocked adjoint solve per
    chunk; the factorizations are freed as soon as the chunk's J is formed,
    so peak memory is chunk_size * n_state^2 regardless of n_samples.
    """
    problem = observable.problem
    J = (
        ObservableControlJacobian(observable)
        if control
        else ObservableJacobian(observable)
    )
    if chunk_size is None:
        chunk_size = auto_chunk_size(problem.state_dim, ms.dtype, problem=problem)

    cache = _jit_cache(observable)

    # materialize solves ONLY A^T X = B^T (jacobian.py:54-60): ask for an
    # adjoint-only factor where the problem supports the hint (halves the
    # cyclic-reduction factorization work); duck-typed problems without the
    # kwarg get the plain call.
    import inspect

    try:
        _adj = "needs" in inspect.signature(problem.linearize).parameters
    except (TypeError, ValueError):
        _adj = False

    def one(m, u, z):
        if _adj:
            lin = problem.linearize(u, m, z, needs="adj")
        else:
            lin = problem.linearize(u, m, z)
        return J.materialize(lin)

    n = ms.shape[0]
    n_single = n <= chunk_size

    # Multi-chunk accumulation fuses the slice-update INTO each chunk's
    # program (donated buffer, traced start index) instead of an n-way
    # jnp.concatenate or separate update programs:
    # * the concat made XLA lay the result out minor-first on the chunk
    #   axis ((chunk, dQ, dM) -> {0,2,1:T(8,128)}), padding chunk=8 to
    #   128 — a measured 16x HBM expansion that OOMed the nx=192 rank-128
    #   lane (28.4G for a 1.8G result);
    # * separate update programs re-expose the same pathological layout
    #   at the chunk program's OUTPUT boundary, paying a layout-converting
    #   copy per chunk (measured +1.3 s at nx=64).
    # In-program, XLA sees the update target's canonical layout and keeps
    # the chunk internal.
    def one_chunk(ms_c, us_c, z_c):
        if zs is not None:
            return jax.vmap(one)(ms_c, us_c, z_c)
        return jax.vmap(lambda m, u: one(m, u, None))(ms_c, us_c)

    def one_chunk_update(J_acc, start, ms_c, us_c, z_c):
        Js_c = one_chunk(ms_c, us_c, z_c)
        zero = jnp.zeros((), start.dtype)
        return jax.lax.dynamic_update_slice(
            J_acc, Js_c, (start,) + (zero,) * (Js_c.ndim - 1)
        )

    # per-sample output shape/dtype: (dQ, dM) in the sample dtype.  (An
    # eval_shape here would re-trace the whole linearize+factorize+vjp graph
    # on EVERY call — measured ~0.4 s of pure Python per materialize at
    # nx=64, a third of the stage.)
    probe = jax.ShapeDtypeStruct(J.shape, ms.dtype)

    def get_fn(b: int):
        ck = ("materialize", control, zs is not None, b, n_single, n,
              str(ms.dtype))
        if ck not in cache:
            m_ex = jax.ShapeDtypeStruct((b, ms.shape[1]), ms.dtype)
            u_ex = jax.ShapeDtypeStruct((b, us.shape[1]), us.dtype)
            z_ex = (
                jax.ShapeDtypeStruct((b, zs.shape[1]), zs.dtype)
                if zs is not None else None
            )
            if n_single:
                cache[ck] = jit_lifted(one_chunk, m_ex, u_ex, z_ex)
            else:
                J_ex = jax.ShapeDtypeStruct((n,) + probe.shape, probe.dtype)
                s_ex = jax.ShapeDtypeStruct((), jnp.int32)
                cache[ck] = jit_lifted(
                    one_chunk_update, J_ex, s_ex, m_ex, u_ex, z_ex,
                    donate_argnums=(0,),
                )
        return cache[ck]

    if precompile_only:
        if n_single:
            return [lambda: get_fn(n)]
        sizes = {chunk_size}
        if n % chunk_size:
            sizes.add(n % chunk_size)
        return [lambda b=b: get_fn(b) for b in sorted(sizes, reverse=True)]

    if n_single:
        return get_fn(n)(ms, us, zs)
    J_all = jnp.zeros((n,) + probe.shape, dtype=probe.dtype)
    for s in range(0, n, chunk_size):
        e = min(s + chunk_size, n)
        z_chunk = zs[s:e] if zs is not None else None
        J_all = get_fn(e - s)(
            J_all, jnp.asarray(s, jnp.int32), ms[s:e], us[s:e], z_chunk
        )
    return J_all


def linearize_batch(observable: LinearStateObservable, ms, us, zs=None):
    """Batched Linearization pytree (factors kept: memory n * n_state^2)."""
    problem = observable.problem
    cache = _jit_cache(observable)
    ck = ("linearize_batch", zs is not None)
    if ck not in cache:
        in_axes = (0, 0, 0 if zs is not None else None)
        cache[ck] = jax.jit(
            jax.vmap(lambda u, m, z: problem.linearize(u, m, z), in_axes=in_axes)
        )
    return cache[ck](us, ms, zs)


class UniformDistribution:
    """Uniform control sampler (reference test fixture:
    `setupPoissonControlProblem.py:352-383`)."""

    def __init__(self, dim: int, a: float, b: float):
        self.dim = dim
        self.a, self.b = float(a), float(b)

    def sample_n(self, key, n: int, dtype=None):
        dtype = dtype or config.default_dtype()
        return jax.random.uniform(
            key, (n, self.dim), dtype=dtype, minval=self.a, maxval=self.b
        )
