"""End-to-end data-generation pipeline — port of
`hippyflow/test/test_dataGenerator.py`: KLE input decoder + data-POD output
decoder -> generate with decoders, without decoders (SVD), and the two-step
(full-state POD then Jacobians-in-subspace) path."""

import os

import jax
import numpy as np
import pytest

from hippyflow_tpu.models import (
    DataGenerator,
    KLEParameterList,
    KLEProjector,
    PODProjectorFromData,
)
from hippyflow_tpu.testing import (
    poisson_control_settings,
    poisson_full_state_observable,
    poisson_pointwise_observable,
    setup_poisson_control_problem,
)

N_SAMPLES = 12
POD_RANK = 8
KLE_RANK = 8


@pytest.fixture(scope="module")
def setup():
    settings = poisson_control_settings()
    settings["nx"] = settings["ny"] = 10
    pde, prior, control_dist, Vh = setup_poisson_control_problem(settings)
    return pde, prior, control_dist, Vh


def _generator(obs, prior, control_dist, rM=6, rZ=6):
    return DataGenerator(
        obs,
        prior,
        control_distribution=control_dist,
        settings={"rM": rM, "rZ": rZ, "verbose": False},
    )


@pytest.mark.slow
def test_generate_with_decoders(setup, tmp_path):
    pde, prior, control_dist, Vh = setup
    obs = poisson_pointwise_observable(pde, Vh, n_obs=10)
    data_dir = str(tmp_path / "withdec") + "/"

    # input decoder from KLE
    kle_params = KLEParameterList()
    kle_params["rank"] = KLE_RANK
    kle_params["verbose"] = False
    kle = KLEProjector(prior, parameters=kle_params)
    d_kle, kle_dec, kle_enc = kle.construct_input_subspace("mass")

    gen = _generator(obs, prior, control_dist)
    gen.generate(
        N_SAMPLES,
        derivatives=(1, 1),
        input_decoder=np.asarray(kle_dec),
        input_encoder=np.asarray(kle_enc),
        data_dir=data_dir,
    )
    mzq = np.load(data_dir + "mzq_data.npz")
    assert mzq["m_data"].shape == (N_SAMPLES, Vh.dim)
    assert mzq["q_data"].shape == (N_SAMPLES, 10)
    assert mzq["z_data"].shape == (N_SAMPLES, 25)
    jpsi = np.load(data_dir + "JPsi_data.npz")
    assert jpsi["JPsi_data"].shape == (N_SAMPLES, 10, KLE_RANK)
    # control jacobian falls back to SVD (no control decoder)
    jz = np.load(data_dir + "Jzsvd_data.npz")
    assert jz["sigmaz_data"].shape[0] == N_SAMPLES


def test_generate_with_output_decoder(setup, tmp_path):
    pde, prior, control_dist, Vh = setup
    obs = poisson_pointwise_observable(pde, Vh, n_obs=10)
    data_dir = str(tmp_path / "outdec") + "/"

    # first pass: plain forward data for a data-driven output POD
    gen = _generator(obs, prior, control_dist)
    gen.generate(N_SAMPLES, derivatives=(0, 0), data_dir=data_dir, clean_up=True)
    q_data = np.load(data_dir + "mzq_data.npz")["q_data"]
    # identity-weighted POD on the 10-dim output
    U, S, Vt = np.linalg.svd(q_data - q_data.mean(0), full_matrices=False)
    phi = Vt[:4].T

    data_dir2 = str(tmp_path / "outdec2") + "/"
    gen2 = _generator(obs, prior, control_dist)
    gen2.generate(
        N_SAMPLES,
        derivatives=(1, 1),
        output_decoder=phi,
        data_dir=data_dir2,
    )
    jsp = np.load(data_dir2 + "JstarPhi_data.npz")
    assert jsp["JstarPhi_data"].shape == (N_SAMPLES, Vh.dim, 4)
    assert np.allclose(jsp["Phi"], phi)
    jzsp = np.load(data_dir2 + "JzstarPhi_data.npz")
    assert jzsp["JzstarPhi_data"].shape == (N_SAMPLES, 25, 4)


def test_generate_with_svd(setup, tmp_path):
    pde, prior, control_dist, Vh = setup
    obs = poisson_pointwise_observable(pde, Vh, n_obs=10)
    data_dir = str(tmp_path / "svd") + "/"
    gen = _generator(obs, prior, control_dist, rM=6)
    gen.generate(N_SAMPLES, derivatives=(1, 0), data_dir=data_dir)
    jsvd = np.load(data_dir + "Jsvd_data.npz")
    assert jsvd["U_data"].shape == (N_SAMPLES, 10, 6)
    assert jsvd["sigma_data"].shape == (N_SAMPLES, 6)
    assert jsvd["V_data"].shape == (N_SAMPLES, Vh.dim, 6)
    # singular values descending
    assert (np.diff(jsvd["sigma_data"], axis=1) <= 1e-12).all()


def test_two_step_generate(setup, tmp_path):
    pde, prior, control_dist, Vh = setup
    obs = poisson_full_state_observable(pde, Vh)
    data_dir = str(tmp_path / "twostep") + "/"
    gen = _generator(obs, prior, control_dist)
    gen.two_step_generate(
        N_SAMPLES,
        derivatives=(1, 1),
        pod_rank=POD_RANK,
        data_dir=data_dir,
    )
    pod_dec = np.load(data_dir + "POD/POD_decoder.npy")
    assert pod_dec.shape == (Vh.dim, POD_RANK)
    jsp = np.load(data_dir + "JstarPhi_data.npz")
    assert jsp["JstarPhi_data"].shape == (N_SAMPLES, Vh.dim, POD_RANK)
    jzsp = np.load(data_dir + "JzstarPhi_data.npz")
    assert jzsp["JzstarPhi_data"].shape == (N_SAMPLES, 25, POD_RANK)


def test_resume(setup, tmp_path):
    pde, prior, control_dist, Vh = setup
    obs = poisson_pointwise_observable(pde, Vh, n_obs=10)
    data_dir = str(tmp_path / "resume") + "/"
    gen = _generator(obs, prior, control_dist)
    gen.settings["chunk_size"] = 4
    gen.generate(8, derivatives=(0, 0), data_dir=data_dir, compress=False,
                 clean_up=False)
    n_chunks_before = len(os.listdir(os.path.join(data_dir, "chunks")))
    # second call resumes and extends to 12
    gen2 = _generator(obs, prior, control_dist)
    gen2.settings["chunk_size"] = 4
    gen2.generate(12, derivatives=(0, 0), data_dir=data_dir, compress=True,
                  clean_up=False)
    mzq = np.load(data_dir + "mzq_data.npz")
    assert mzq["m_data"].shape[0] == 12
    assert n_chunks_before == 2


@pytest.mark.slow
def test_failed_solve_archival(tmp_path):
    """Nonconverged samples are resampled and their parameters archived to
    skipped/ (reference `dataGenerator.py:232-241`)."""
    import jax
    import jax.numpy as jnp

    from hippyflow_tpu.fem import FunctionSpace, unit_square_mesh
    from hippyflow_tpu.models import BiLaplacianPrior, DataGenerator
    from hippyflow_tpu.models.pde_problem import NewtonInfo
    from hippyflow_tpu.models.sampling import sample_until_solved
    from hippyflow_tpu.utils import KeyChain

    V = FunctionSpace(unit_square_mesh(6))
    prior = BiLaplacianPrior(V, gamma=0.1, delta=1.0)

    class FlakyProblem:
        """Fails whenever the sample's first dof exceeds its median."""

        state_dim = V.dim
        Vu = V
        _use_block_tridiag = False

        def solve_fwd(self, m, z=None, u0=None):
            info = NewtonInfo(
                converged=m[0] < 0.0,
                iterations=jnp.asarray(1),
                residual_norm=jnp.asarray(0.0),
            )
            return m * 2.0, info

        def linearize(self, u, m, z=None):
            raise NotImplementedError

    class StubObservable:
        problem = FlakyProblem()

        def evalu(self, u):
            return u[:3]

    obs = StubObservable()
    batch = sample_until_solved(obs, prior, KeyChain(0), 32, chunk_size=32)
    assert batch.n_failures > 0
    assert batch.failed_ms is not None
    assert batch.failed_ms.shape[0] == batch.n_failures
    # every archived parameter indeed failed the converged predicate
    assert (batch.failed_ms[:, 0] >= 0.0).all()
    # every kept sample converged
    assert bool((np.asarray(batch.ms[:, 0]) < 0.0).all())

    dg = DataGenerator(obs, prior, settings={"verbose": False, "chunk_size": 16})
    dg.generate(16, derivatives=(0, 0), data_dir=str(tmp_path))
    skipped = list((tmp_path / "skipped").glob("m_failed_*.npy"))
    assert skipped, "no skipped archive written"
    arr = np.load(skipped[0])
    assert arr.ndim == 2 and arr.shape[1] == V.dim


def test_prefetch_host_chunks_match_concatenated():
    """prefetch_host=True exposes per-chunk (m, q, z) host transfers that
    reassemble bitwise-identically to the concatenated SampleBatch arrays
    (and to a prefetch_host=False run with the same keys)."""
    import jax.numpy as jnp

    from hippyflow_tpu.fem import FunctionSpace, unit_square_mesh
    from hippyflow_tpu.models import BiLaplacianPrior
    from hippyflow_tpu.models.pde_problem import NewtonInfo
    from hippyflow_tpu.models.sampling import sample_until_solved
    from hippyflow_tpu.utils import KeyChain

    V = FunctionSpace(unit_square_mesh(6))
    prior = BiLaplacianPrior(V, gamma=0.1, delta=1.0)

    class LinearStub:
        state_dim = V.dim
        Vu = V
        is_fwd_linear = True

        def solve_fwd(self, m, z=None, u0=None):
            info = NewtonInfo(
                converged=jnp.asarray(True),
                iterations=jnp.asarray(1),
                residual_norm=jnp.asarray(0.0),
            )
            return 2.0 * m, info

    class StubObservable:
        problem = LinearStub()

        def evalu(self, u):
            return u[:5]

    obs = StubObservable()
    batch = sample_until_solved(
        obs, prior, KeyChain(7), 12, chunk_size=5, prefetch_host=True
    )
    assert batch.host_chunks is not None
    assert [c[0].shape[0] for c in batch.host_chunks] == [5, 5, 2]
    m_cat = np.concatenate([np.asarray(c[0]) for c in batch.host_chunks])
    q_cat = np.concatenate([np.asarray(c[1]) for c in batch.host_chunks])
    assert all(c[2] is None for c in batch.host_chunks)
    np.testing.assert_array_equal(m_cat, np.asarray(batch.ms))
    np.testing.assert_array_equal(q_cat, np.asarray(batch.qs))

    plain = sample_until_solved(obs, prior, KeyChain(7), 12, chunk_size=5)
    assert plain.host_chunks is None
    np.testing.assert_array_equal(np.asarray(plain.ms), np.asarray(batch.ms))
    np.testing.assert_array_equal(np.asarray(plain.qs), np.asarray(batch.qs))
