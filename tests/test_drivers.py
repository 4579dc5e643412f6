"""End-to-end smoke tests of the application drivers at tiny scale.

The reference exercises its distributed pipelines through the application
drivers (`mpirun -n 4 generate_confusion.py`, SURVEY.md §4); these tests run
the same drivers in-process with reduced sizes and check the artifact
layout: decoders, spectra, error_data.pkl, metadata.pkl, training data, and
the multirun sweep logger.
"""

import os
import pickle
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_main(module_path, argv, monkeypatch):
    import importlib

    monkeypatch.setattr(sys, "argv", [module_path] + argv)
    mod = importlib.import_module(module_path)
    mod.main()


@pytest.mark.slow
def test_confusion_setup_driver(tmp_path, monkeypatch):
    out = str(tmp_path / "conf") + "/"
    _run_main(
        "applications.confusion_setup",
        [
            "--nx", "12", "--sqrt_n_obs", "4", "--rank", "6",
            "--oversampling", "4", "--n_samples", "10", "--n_data", "10",
            "--jacobian_rank", "4", "--output", out, "--error_test",
        ],
        monkeypatch,
    )
    for f in (
        "AS_10_input_decoder.npy",
        "AS_10_d_GN.npy",
        "KLE_decoder.npy",
        "POD_projector.npy",
        "mq_data.npz",
        "error_data.pkl",
        "metadata.pkl",
    ):
        assert os.path.exists(os.path.join(out, f)), f
    with open(os.path.join(out, "error_data.pkl"), "rb") as fh:
        err = pickle.load(fh)
    assert "input_output" in err and len(err["input_output"]["avg"]) >= 1
    with open(os.path.join(out, "metadata.pkl"), "rb") as fh:
        meta = pickle.load(fh)
    assert meta["as_input_time"] > 0
    jd = np.load(os.path.join(out, "jacobian_data", "Jsvd_data.npz"))
    assert jd["U_data"].shape[0] == 10


@pytest.mark.slow
def test_helmholtz_setup_driver(tmp_path, monkeypatch):
    out = str(tmp_path / "helm") + "/"
    _run_main(
        "applications.helmholtz_setup",
        [
            "--nx", "10", "--sqrt_n_obs", "3", "--rank", "4",
            "--oversampling", "3", "--n_samples", "6", "--n_data", "6",
            "--output", out,
        ],
        monkeypatch,
    )
    assert os.path.exists(os.path.join(out, "metadata.pkl"))
    assert os.path.exists(os.path.join(out, "mq_data.npz"))


@pytest.mark.slow
def test_training_and_multirun_drivers(tmp_path, monkeypatch):
    """Setup -> training driver -> multirun sweep with resumable logger."""
    out = str(tmp_path / "conf") + "/"
    _run_main(
        "applications.confusion_setup",
        [
            "--nx", "10", "--sqrt_n_obs", "4", "--rank", "6",
            "--oversampling", "4", "--n_samples", "12", "--n_data", "12",
            "--jacobian_rank", "4", "--output", out,
        ],
        monkeypatch,
    )
    logger_out = str(tmp_path / "log.pkl")
    _run_main(
        "applications.confusion_training",
        [
            "--data_dir", out, "--architecture", "as_dense",
            "--fixed_input_rank", "4", "--fixed_output_rank", "4",
            "--epochs", "3", "--batch_size", "4",
            "--logger_out", logger_out,
        ],
        monkeypatch,
    )
    assert os.path.exists(logger_out)
    with open(logger_out, "rb") as fh:
        logger = pickle.load(fh)
    assert "train_loss" in logger or len(logger) > 0

    sweep_out = str(tmp_path / "sweep.pkl")
    _run_main(
        "applications.confusion_multirun",
        [
            "--data_dir", out, "--data_sizes", "4,8", "--n_seeds", "1",
            "--epochs", "2", "--fixed_input_rank", "4",
            "--fixed_output_rank", "4", "--out", sweep_out,
        ],
        monkeypatch,
    )
    assert os.path.exists(sweep_out)
    with open(sweep_out, "rb") as fh:
        master = pickle.load(fh)
    assert len(master) >= 1


def test_load_helmholtz_data_options(tmp_path):
    """The helmholtz loader's reference options (`helmholtz_utilities.py:17-114`):
    n_data truncation, rescale standard-scaling, derivatives bundle loading,
    and the rescale+derivatives NotImplementedError."""
    from applications.helmholtz_training import load_helmholtz_data

    rng = np.random.default_rng(0)
    n, dM, dQ, r = 12, 7, 5, 3
    m = rng.normal(2.0, 3.0, (n, dM))
    q = rng.normal(-1.0, 0.5, (n, dQ))
    np.savez(tmp_path / "mq_data.npz", m_data=m, q_data=q)

    m2, q2 = load_helmholtz_data(str(tmp_path), n_data=8)
    assert m2.shape == (8, dM) and q2.shape == (8, dQ)
    np.testing.assert_allclose(m2, m[:8])

    ms, qs = load_helmholtz_data(str(tmp_path), rescale=True)
    np.testing.assert_allclose(ms.mean(axis=0), 0.0, atol=1e-12)
    np.testing.assert_allclose(ms.std(axis=0), 1.0, atol=1e-12)
    np.testing.assert_allclose(qs.std(axis=0), 1.0, atol=1e-12)

    # derivatives=True without the bundle: dict with only m/q
    out = load_helmholtz_data(str(tmp_path), derivatives=True)
    assert set(out) == {"m_data", "q_data"}

    np.savez(
        tmp_path / "Jsvd_data.npz",
        U_data=rng.normal(size=(n, dQ, r)),
        sigma_data=rng.normal(size=(n, r)),
        V_data=rng.normal(size=(n, dM, r)),
    )
    out = load_helmholtz_data(str(tmp_path), derivatives=True, n_data=6)
    assert out["U_data"].shape == (6, dQ, r)
    assert out["sigma_data"].shape == (6, r)
    assert out["V_data"].shape == (6, dM, r)

    with pytest.raises(NotImplementedError):
        load_helmholtz_data(str(tmp_path), rescale=True, derivatives=True)
