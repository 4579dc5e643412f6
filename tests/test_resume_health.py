"""Kill-and-restart resume parity + iterative-solver health surfacing.

VERDICT round-1 items 7 and 8: resume must be chunk-granular for
PODProjector.generate_training_data and AS.construct_low_rank_Jacobians
(reference per-sample scans, `PODProjector.py:147-186`,
`activeSubspaceProjector.py:939-976`), and a stagnated iterative solve must
be visible to callers instead of silently corrupting Jacobians.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hippyflow_tpu as hf
from hippyflow_tpu.testing import (
    poisson_control_settings,
    poisson_pointwise_observable,
    setup_poisson_control_problem,
)


def _small_problem(linear=True, nx=10):
    st = poisson_control_settings()
    st["nx"] = st["ny"] = nx
    st["LINEAR"] = linear
    pde, prior, ctrl, Vh = setup_poisson_control_problem(st)
    obs = poisson_pointwise_observable(pde, Vh, n_obs=6)
    return obs, prior, ctrl, Vh


def test_pod_training_data_resume(tmp_path):
    """A killed run leaves finished chunks; the restart completes only the
    missing ones and the final artifact equals a clean run with the same
    chunking (chunk boundaries determine the PRNG stream)."""
    obs, prior, ctrl, _ = _small_problem()
    out = str(tmp_path / "data")

    def make_pod():
        p = hf.PODParameterList()
        p["data_per_process"] = 9
        p["chunk_size"] = 3
        p["verbose"] = False
        return hf.PODProjector(
            obs, prior, control_distribution=ctrl, parameters=p
        )

    # clean reference run
    ref_dir = str(tmp_path / "ref")
    m_ref, q_ref = make_pod().generate_training_data(ref_dir)

    # "killed" run: generate only the first chunk by asking for 3 samples
    pod1 = make_pod()
    m1, q1 = pod1.generate_training_data(out, n_data=3)
    # re-create the chunk dir state a kill would leave (the full-run
    # completion consolidated + removed it): put chunk 0 back
    chunk_dir = os.path.join(out, "chunks_pod")
    os.makedirs(chunk_dir, exist_ok=True)
    np.savez(
        os.path.join(chunk_dir, "chunk_0_3.npz"),
        m_data=m_ref[:3], q_data=q_ref[:3],
    )
    os.remove(os.path.join(out, "mq_data.npz"))

    # restart in a FRESH instance (as a new process would): per-chunk
    # deterministic keys mean the resumed run reproduces the clean run
    # bit-for-bit, with no manual PRNG bookkeeping
    pod2 = make_pod()
    m2, q2 = pod2.generate_training_data(out)
    assert m2.shape[0] == 9
    np.testing.assert_allclose(m2, m_ref, rtol=0, atol=0)
    np.testing.assert_allclose(q2, q_ref, rtol=0, atol=0)


def test_as_jacobian_data_resume(tmp_path):
    """construct_low_rank_Jacobians resumes from saved chunks: a second call
    with check_for_data=True must not recompute finished chunks and must
    return identical factors."""
    obs, prior, ctrl, _ = _small_problem()
    p = hf.ActiveSubspaceParameterList()
    p["samples_per_process"] = 6
    p["jacobian_rank"] = 4
    p["chunk_size"] = 3
    p["verbose"] = False
    AS = hf.ActiveSubspaceProjector(
        obs, prior, control_distribution=ctrl, parameters=p
    )
    out = str(tmp_path / "jd")
    U1, s1, V1 = AS.construct_low_rank_Jacobians(out)
    z = np.load(os.path.join(out, "Jsvd_data.npz"))
    assert z["U_data"].shape[0] == 6

    # simulate a partial run: put back one finished chunk, then re-run
    chunk_dir = os.path.join(out, "chunks")
    os.makedirs(chunk_dir, exist_ok=True)
    np.savez(
        os.path.join(chunk_dir, "chunk_0_3.npz"),
        U_data=np.asarray(U1[:3]) + 7.0,  # sentinel: must be LOADED, not recomputed
        sigma_data=np.asarray(s1[:3]),
        V_data=np.asarray(V1[:3]),
    )
    U2, s2, V2 = AS.construct_low_rank_Jacobians(out)
    np.testing.assert_allclose(
        np.asarray(U2[:3]), np.asarray(U1[:3]) + 7.0, rtol=0, atol=0
    )
    np.testing.assert_allclose(np.asarray(U2[3:]), np.asarray(U1[3:]), rtol=1e-10)

    # control-Jacobian variant writes the Jzsvd schema
    Uz, sz, Vz = AS.construct_low_rank_control_Jacobians(out)
    zz = np.load(os.path.join(out, "Jzsvd_data.npz"))
    assert zz["Uz_data"].shape[0] == 6 and zz["sigmaz_data"].shape[1] == sz.shape[1]


def test_iterative_solver_health_surfaces_stagnation():
    """A deliberately under-iterated BiCGStab must report a large relative
    residual through solve_info / solve_incremental(return_info=True), and
    the linear-solve convergence flag must go False."""
    st = poisson_control_settings()
    st["nx"] = st["ny"] = 12
    from hippyflow_tpu.testing import make_poisson_varf

    pde, prior, ctrl, Vh = setup_poisson_control_problem(st)
    starved = hf.VariationalPDEProblem(
        Vh,
        Vh,
        make_poisson_varf(st),
        pde.bc,
        is_fwd_linear=True,
        control_dim=pde.control_dim,
        solver="iterative",
    )
    starved._iterative_maxiter = 2  # starve the solver

    m = prior.sample(jax.random.normal(jax.random.PRNGKey(0), (Vh.dim,)))
    z = ctrl.sample_n(jax.random.PRNGKey(1), 1)[0]
    u, info = starved.solve_fwd(m, z)
    assert not bool(info.converged), "starved linear solve must flag failure"

    lin = starved.linearize(u, m, z)
    rhs = jax.random.normal(jax.random.PRNGKey(2), (Vh.dim, 2))
    x, rel = starved.solve_incremental(lin, rhs, return_info=True)
    assert float(rel) > 1e-4, f"stagnation must be visible, rel={float(rel)}"

    # healthy configuration: tight residual, converged flag True
    healthy = hf.VariationalPDEProblem(
        Vh,
        Vh,
        make_poisson_varf(st),
        pde.bc,
        is_fwd_linear=True,
        control_dim=pde.control_dim,
        solver="iterative",
    )
    u2, info2 = healthy.solve_fwd(m, z)
    assert bool(info2.converged)
    lin2 = healthy.linearize(u2, m, z)
    x2, rel2 = healthy.solve_incremental(lin2, rhs, return_info=True)
    assert float(rel2) < 1e-6
    # direct factors report exact (0.0) residual info
    x3, rel3 = pde.solve_incremental(
        pde.linearize(u2, m, z), rhs, return_info=True
    )
    assert float(rel3) == 0.0


@pytest.mark.parametrize("k", [2, 3])
def test_shamanskii_newton_matches_classical(k):
    """Stale-factor Newton converges to the same solution as classical
    Newton within tolerance on the nonlinear Poisson problem."""
    obs, prior, ctrl, Vh = _small_problem(linear=False, nx=10)
    pde = obs.problem
    from hippyflow_tpu.testing import make_poisson_varf, poisson_control_settings

    st = poisson_control_settings()
    st["nx"] = st["ny"] = 10
    st["LINEAR"] = False
    pde_k = hf.VariationalPDEProblem(
        Vh,
        Vh,
        make_poisson_varf(st),
        pde.bc,
        is_fwd_linear=False,
        control_dim=pde.control_dim,
        newton_stale_factor=k,
    )
    m = prior.sample(jax.random.normal(jax.random.PRNGKey(3), (Vh.dim,)))
    z = ctrl.sample_n(jax.random.PRNGKey(4), 1)[0]
    u_ref, info_ref = pde.solve_fwd(m, z)
    u_k, info_k = pde_k.solve_fwd(m, z)
    assert bool(info_ref.converged) and bool(info_k.converged)
    np.testing.assert_allclose(
        np.asarray(u_k), np.asarray(u_ref), rtol=1e-6, atol=1e-8
    )
