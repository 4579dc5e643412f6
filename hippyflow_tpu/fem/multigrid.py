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


def coarse_newton_warm_start(
    prior, problem_coarse, V_fine, V_coarse, coarser_levels=()
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
    """
    chain = [(problem_coarse, V_coarse)] + list(coarser_levels)

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
