"""POD-from-data invariants — port of `hippyflow/test/test_PODProjector.py`.

All three methods (hep / ghep / inverse_ghep) x {shifted, unshifted}:
M-orthogonality to 1e-8, correct shift, and the eigenproblem residual of
E[(u - u_bar)(u - u_bar)^T M] below 1e-2.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hippyflow_tpu.fem import FunctionSpace, unit_square_mesh, mass_matrix
from hippyflow_tpu.models import PODProjectorFromData

ORTH_TOL = 1e-8
RES_TOL = 1e-2
RANK = 20


@pytest.fixture(scope="module")
def pod_data():
    V = FunctionSpace(unit_square_mesh(12))
    # synthetic smooth data with rapid spectral decay
    key = jax.random.PRNGKey(0)
    x = V.dof_coords
    n_data = 64
    coeffs = jax.random.normal(key, (n_data, 8, 8))
    modes = np.stack(
        [
            np.sin((i + 1) * np.pi * x[:, 0]) * np.sin((j + 1) * np.pi * x[:, 1])
            / (1.0 + i + j) ** 3
            for i in range(8)
            for j in range(8)
        ],
        axis=0,
    ).reshape(8, 8, -1)
    u_data = jnp.einsum("nij,ijd->nd", coeffs, jnp.asarray(modes))
    u_data = u_data + 0.7  # nonzero mean so the shift matters
    return V, u_data


@pytest.mark.parametrize("method", ["hep", "ghep", "inverse_ghep"])
@pytest.mark.parametrize("shifted", [True, False])
def test_pod_from_data(pod_data, method, shifted):
    V, u_data = pod_data
    pod = PODProjectorFromData([V])
    d, phi, Mphi, u_shift = pod.construct_subspace(
        u_data, RANK, shifted=shifted, method=method, verify=False
    )
    M = pod.M
    r_check = RANK - 1 if shifted else RANK

    # M-orthogonality
    orth = np.linalg.norm(
        np.asarray(phi[:, :r_check].T @ (M @ phi[:, :r_check]))
        - np.eye(r_check)
    )
    assert orth < ORTH_TOL
    # Mphi relation
    assert float(jnp.linalg.norm(M @ phi - Mphi) / jnp.linalg.norm(Mphi)) < ORTH_TOL
    # shift
    if shifted:
        assert float(jnp.linalg.norm(u_shift)) > 0.0
        np.testing.assert_allclose(
            np.asarray(u_shift), np.asarray(u_data.mean(axis=0)), rtol=1e-12
        )
    else:
        assert float(jnp.linalg.norm(u_shift)) == 0.0
    # eigenproblem residual: (1/n) X X^T M phi = phi diag(d)
    X = (u_data - u_shift[None, :]).T
    n = u_data.shape[0]
    Hphi = X @ (X.T @ Mphi[:, :r_check]) / n
    res = np.linalg.norm(
        np.asarray(Hphi - phi[:, :r_check] * d[None, :r_check])
    ) / np.linalg.norm(np.asarray(Hphi))
    assert res < RES_TOL


def test_methods_agree(pod_data):
    V, u_data = pod_data
    pod = PODProjectorFromData([V])
    ds = {}
    for method in ["hep", "ghep", "inverse_ghep"]:
        d, phi, Mphi, _ = pod.construct_subspace(
            u_data, 10, shifted=True, method=method
        )
        ds[method] = np.asarray(d)
    np.testing.assert_allclose(ds["hep"], ds["ghep"], rtol=1e-8, atol=1e-14)
    np.testing.assert_allclose(ds["hep"], ds["inverse_ghep"], rtol=1e-8, atol=1e-14)


def test_sampled_pod_projector():
    """PODProjector end-to-end on the Poisson control fixture."""
    from hippyflow_tpu.models import PODParameterList, PODProjector
    from hippyflow_tpu.testing import (
        poisson_pointwise_observable,
        setup_poisson_control_problem,
        poisson_control_settings,
    )

    settings = poisson_control_settings()
    settings["nx"] = settings["ny"] = 10
    pde, prior, control_dist, Vh = setup_poisson_control_problem(settings)
    obs = poisson_pointwise_observable(pde, Vh, n_obs=20)
    params = PODParameterList()
    params["sample_per_process"] = 32
    params["rank"] = 12
    params["verbose"] = False
    pod = PODProjector(obs, prior, control_distribution=control_dist, parameters=params)
    d, dec, enc = pod.construct_subspace()
    assert d.shape == (12,)
    assert float(jnp.abs(dec.T @ dec - jnp.eye(12)).max()) < 1e-10
    assert bool((np.diff(np.asarray(d)) <= 1e-12).all())  # descending
    avg, std = pod.test_output_errors(ranks=(2, 8, 12))
    assert avg[0] >= avg[1] >= avg[2] - 1e-12


@pytest.mark.slow
def test_pod_auxiliary_methods(tmp_path):
    """two_state_solution, save_mass_and_stiffness_matrices, and
    input_output_error_test (`PODProjector.py:298-327,481-654`)."""
    import scipy.sparse as sp

    from hippyflow_tpu.fem import (
        DirichletBC,
        GalerkinForm,
        mass_matrix,
        stiffness_matrix,
    )
    from hippyflow_tpu.models import (
        BiLaplacianPrior,
        KLEParameterList,
        KLEProjector,
        PODParameterList,
        PODProjector,
        VariationalPDEProblem,
    )
    from hippyflow_tpu.testing import poisson_pointwise_observable

    Vh = FunctionSpace(unit_square_mesh(10))
    bc = DirichletBC.from_predicate(Vh, None, 0.0)
    form = GalerkinForm(
        flux=lambda x, u, gu, m, z, c: jnp.exp(m) * gu,
        source=lambda x, u, gu, m, z, c: -1.0,
    )
    pde = VariationalPDEProblem(Vh, Vh, form, bc, is_fwd_linear=True)
    prior = BiLaplacianPrior(Vh, gamma=0.1, delta=1.0)
    obs = poisson_pointwise_observable(pde, Vh, n_obs=20)
    params = PODParameterList()
    params["sample_per_process"] = 24
    params["rank"] = 10
    params["verbose"] = False
    params["output_directory"] = str(tmp_path)

    # control-free projector for the error test
    pod = PODProjector(obs, prior, parameters=params)
    pod.construct_subspace()

    # two_state_solution artifacts
    (m_mean, u_mean), (m_s, u_s) = pod.two_state_solution()
    for name in ["m_mean", "u_at_mean", "m_sample", "u_at_sample"]:
        arr = np.load(tmp_path / "two_states" / f"{name}.npy")
        assert np.isfinite(arr).all()
    assert u_mean.shape == m_mean.shape

    # mass/stiffness CSR artifacts match the dense assemblers
    pod.save_mass_and_stiffness_matrices()
    M_csr = sp.load_npz(tmp_path / "mass_csr.npz")
    K_csr = sp.load_npz(tmp_path / "stiffness_csr.npz")
    np.testing.assert_allclose(
        M_csr.toarray(), np.asarray(mass_matrix(pde.Vu)), atol=1e-14
    )
    np.testing.assert_allclose(
        K_csr.toarray(), np.asarray(stiffness_matrix(pde.Vu)), atol=1e-12
    )

    # input/output error test: error decreases as both ranks grow
    kle_params = KLEParameterList()
    kle_params["rank"] = 10
    kle_params["verbose"] = False
    kle = KLEProjector(prior, parameters=kle_params)
    _, V_kle, _ = kle.construct_input_subspace("identity")
    avg, std = pod.input_output_error_test(
        V_kle, rank_pairs=[(2, 2), (10, 10)]
    )
    assert avg[0] >= avg[1] - 1e-12
    assert len(std) == 2
