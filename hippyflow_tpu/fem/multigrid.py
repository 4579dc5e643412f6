"""Two-grid transfer operators and grid-sequenced Newton warm starts.

Nested iteration (grid sequencing): solve the nonlinear forward problem on
a 2x-coarser structured mesh, interpolate the solution to the fine mesh,
and start the fine Newton iteration there.  Measured on the confusion
problem on the v5e (benchmarks/probe_gridseq.py): cold starts take 5
Newton iterations; coarse-warm starts take 2 at nx=64 (256-lane chunks,
377 -> 279 ms incl. the coarse stage, 1.35x) and just 1 at nx=192
(32-lane chunks, 2348 -> 936 ms, 2.51x) — the coarse map itself costs
18-27% of the cold solve and shrinks relative to the fine work as nx
grows (quarter dofs x half block size).

The warm start is a deterministic pure function of the sample's own
parameter draw (noise -> m -> coarse solve -> prolongation), so unlike
cross-chunk state carrying it preserves the bit-exact chunk-resume
guarantee of the data-generation drivers (tests/test_resume_health.py).

The reference has no analog — its per-sample dolfin NewtonSolver always
cold-starts (hippyflow/modeling/activeSubspaceProjector.py:205-214); this
is a TPU-native throughput optimization of the same map.

Transfers assume the structured lexicographic P1 layout of
``unit_square_mesh`` (``mesh.structured_shape``); scalar or (n, k)
multi-component dof arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _grid_shape(V) -> tuple[int, int]:
    shape = getattr(V.mesh, "structured_shape", None)
    if shape is None:
        raise ValueError("multigrid transfers need a structured mesh")
    nx, ny = shape
    return nx + 1, ny + 1


def restrict_injection(x, V_fine, V_coarse):
    """Injection restriction: keep every second grid node per axis.

    x: (n_f,) or (n_f, k) dof array on the fine space -> (n_c,[ k]).
    """
    sfx, sfy = _grid_shape(V_fine)
    scx, scy = _grid_shape(V_coarse)
    assert (sfx - 1, sfy - 1) == (2 * (scx - 1), 2 * (scy - 1)), (
        "coarse mesh must be exactly 2x coarser"
    )
    x = jnp.asarray(x)
    trail = x.shape[1:]
    g = x.reshape((sfy, sfx) + trail)
    return g[::2, ::2].reshape((scx * scy,) + trail)


def prolong_linear(xc, V_coarse, V_fine):
    """Exact 2:1 linear interpolation: coarse nodes inject, edge midpoints
    average their two endpoints, cell centers average the four corners.

    xc: (n_c,) or (n_c, k) dof array on the coarse space -> (n_f,[ k]).
    """
    sfx, sfy = _grid_shape(V_fine)
    scx, scy = _grid_shape(V_coarse)
    assert (sfx - 1, sfy - 1) == (2 * (scx - 1), 2 * (scy - 1)), (
        "fine mesh must be exactly 2x finer"
    )
    xc = jnp.asarray(xc)
    trail = xc.shape[1:]
    g = xc.reshape((scy, scx) + trail)
    f = jnp.zeros((sfy, sfx) + trail, dtype=xc.dtype)
    f = f.at[::2, ::2].set(g)
    f = f.at[1::2, ::2].set(0.5 * (g[:-1, :] + g[1:, :]))
    f = f.at[::2, 1::2].set(0.5 * (g[:, :-1] + g[:, 1:]))
    f = f.at[1::2, 1::2].set(
        0.25 * (g[:-1, :-1] + g[:-1, 1:] + g[1:, :-1] + g[1:, 1:])
    )
    return f.reshape((sfx * sfy,) + trail)


class SplitWarmStartChain:
    """Grid-sequencing warm-start map compiled as PER-LEVEL XLA programs.

    Functionally identical to the single-program map built by
    :func:`coarse_newton_warm_start` (same per-level solves, transfers and
    failure fallbacks), but each level's Newton solve is its own jitted
    program: the 1 + depth programs compile CONCURRENTLY through
    `sampling.precompile_parallel` instead of as one monolithic chain whose
    XLA compile is the nx192 lane's longest serial pole (VERDICT r4 item 5).
    Costs one extra HBM round trip per level per chunk — O(n_coarse * b)
    bytes, noise vs the solves.

    Duck-typed for `sampling.sample_until_solved`: callable
    ``noise (b, noise_dim) -> u0 (b, n_fine)`` with a ``builders(b, dtype)``
    method returning the per-level program builders for threaded AOT
    pre-compilation.
    """

    def __init__(self, prior, chain, V_fine):
        self.prior = prior
        self.chain = list(chain)  # [(problem, V)] fine-to-coarse
        self.V_fine = V_fine
        self._progs: dict = {}

    # -- per-level pure functions (vmapped + jitted per batch size) --------
    def _restrict_fn(self):
        prior, chain, V_fine = self.prior, self.chain, self.V_fine

        def one(noise):
            m = prior.sample(noise)
            ms = []
            V_prev = V_fine
            for _, V in chain:
                m = restrict_injection(m, V_prev, V)
                ms.append(m)
                V_prev = V
            return tuple(ms)

        return jax.vmap(one)

    def _level_fn(self, k: int):
        problem, V = self.chain[k]
        V_up = self.V_fine if k == 0 else self.chain[k - 1][1]

        def one(m_k, u0_k):
            u, info = problem.solve_fwd(m_k, u0=u0_k)
            ok = info.converged & jnp.all(jnp.isfinite(u))
            u0_up = prolong_linear(
                jnp.where(ok, u, jnp.zeros_like(u)), V, V_up
            )
            good = ok & jnp.all(jnp.isfinite(u0_up))
            return jnp.where(good, u0_up, jnp.zeros_like(u0_up))

        return jax.vmap(one)

    def _get(self, key, build):
        if key not in self._progs:
            self._progs[key] = build()
        return self._progs[key]

    def builders(self, b: int, dtype):
        """Zero-arg program builders (restrict + one per level) at batch
        size b, for `precompile_parallel`."""
        from ..models.sampling import jit_lifted  # local: avoid cycle

        noise_ex = jax.ShapeDtypeStruct((b, self.prior.noise_dim), dtype)

        def mk_restrict():
            return self._get(
                ("restrict", b, str(dtype)),
                lambda: jit_lifted(self._restrict_fn(), noise_ex),
            )

        out = [mk_restrict]
        for k in range(len(self.chain)):
            dim_k = self.chain[k][1].dim
            m_ex = jax.ShapeDtypeStruct((b, dim_k), dtype)
            u0_ex = jax.ShapeDtypeStruct((b, dim_k), dtype)
            out.append(
                lambda k=k, m_ex=m_ex, u0_ex=u0_ex: self._get(
                    ("level", k, b, str(dtype)),
                    lambda: jit_lifted(self._level_fn(k), m_ex, u0_ex),
                )
            )
        return out

    def __call__(self, noise):
        b = noise.shape[0]
        dtype = noise.dtype
        blds = self.builders(b, dtype)
        restrict = blds[0]()
        ms = restrict(noise)
        u0 = jnp.zeros((b, self.chain[-1][1].dim), dtype=dtype)
        for k in reversed(range(len(self.chain))):
            u0 = blds[1 + k]()(ms[k], u0)
        return u0


def coarse_newton_warm_start(
    prior, problem_coarse, V_fine, V_coarse, coarser_levels=(),
    split: bool = False,
):
    """Build a per-sample warm-start map ``noise (b, noise_dim) -> u0 (b, n_f)``
    for ``sample_until_solved(coarse_warm_start=...)``.

    Recomputes m = prior.sample(noise) (deterministic — the fine solve
    program sees the identical parameter), restricts it to the coarse
    space, solves the coarse nonlinear problem, and interpolates the
    solution.  Lanes whose coarse solve failed fall back to a zero initial
    guess.  The returned function is unjitted (one ``jax.vmap`` body);
    ``sample_until_solved`` jits it per chunk shape.

    ``coarser_levels``: optional sequence of ``(problem, V)`` pairs, each
    exactly 2x coarser than the previous level — FULL nested iteration:
    the coarse Newton solve is itself warm-started from the next-coarser
    grid, recursively, with only the coarsest level cold-starting.  At
    nx=192 the 2-grid coarse stage is 45% of the warm-start cost and
    cold-runs ~4 Newton iterations at nx=96; a third grid cuts those to
    1-2 (benchmarks/probe_gridseq_deep.py).  Any level that fails to
    converge (or goes non-finite) degrades gracefully to a zero initial
    guess for the level above it.

    ``split=True`` returns a :class:`SplitWarmStartChain` — the same map
    factored into per-level XLA programs that compile concurrently (the
    monolithic chain program is the nx192 lane's longest cold-compile
    pole).
    """
    chain = [(problem_coarse, V_coarse)] + list(coarser_levels)
    if split:
        return SplitWarmStartChain(prior, chain, V_fine)

    def solve_at(level, m_level):
        """Solve chain[level] at its restricted parameter, warm-started
        from chain[level+1]; returns (u, converged)."""
        problem, V_here = chain[level]
        u0 = None
        if level + 1 < len(chain):
            _, V_next = chain[level + 1]
            m_next = restrict_injection(m_level, V_here, V_next)
            u_next, ok_next = solve_at(level + 1, m_next)
            u0 = prolong_linear(u_next, V_next, V_here)
            ok0 = ok_next & jnp.all(jnp.isfinite(u0))
            u0 = jnp.where(ok0, u0, jnp.zeros_like(u0))
        u, info = problem.solve_fwd(m_level, u0=u0)
        return u, info.converged

    def one(noise):
        m = prior.sample(noise)
        m_c = restrict_injection(m, V_fine, V_coarse)
        u_c, ok = solve_at(0, m_c)
        u0 = prolong_linear(u_c, V_coarse, V_fine)
        good = ok & jnp.all(jnp.isfinite(u0))
        return jnp.where(good, u0, jnp.zeros_like(u0))

    return jax.vmap(one)
