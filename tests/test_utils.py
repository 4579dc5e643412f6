"""Utilities: plotting entry points, mesh serialization, collective
operators, ParameterList/KeyChain behavior."""

import numpy as np
import jax.numpy as jnp

from hippyflow_tpu.fem import FunctionSpace, unit_square_mesh
from hippyflow_tpu.parallel import (
    CollectiveOperator,
    MatrixMultCollectiveOperator,
    NullCollective,
)
from hippyflow_tpu.utils import (
    load_mesh,
    plot,
    plot_accs_vs_data,
    plot_eigenvector,
    plot_pts,
    plot_singular_values_with_std,
    save_mesh,
    spectrum_plot,
    subspace_angle_video,
)


def test_mesh_roundtrip(tmp_path):
    mesh = unit_square_mesh(7)
    path = str(tmp_path / "mesh.npz")
    save_mesh(mesh, path)
    back = load_mesh(path)
    np.testing.assert_array_equal(back.vertices, mesh.vertices)
    np.testing.assert_array_equal(back.cells, mesh.cells)
    np.testing.assert_array_equal(back.boundary_mask, mesh.boundary_mask)
    assert back.structured_shape == mesh.structured_shape


def test_plotting_entry_points(tmp_path):
    d = np.logspace(0, -8, 20)
    assert spectrum_plot(d, out_name=str(tmp_path / "spec.pdf")) is not None
    assert (tmp_path / "spec.pdf").exists()
    plot_singular_values_with_std(
        d, 0.1 * d, out_name=str(tmp_path / "sv.pdf")
    )
    assert (tmp_path / "sv.pdf").exists()
    plot_accs_vs_data([32, 64, 128], [[0.5, 0.7, 0.9]], labels=["net"],
                      out_name=str(tmp_path / "acc.pdf"))
    assert (tmp_path / "acc.pdf").exists()
    V = FunctionSpace(unit_square_mesh(6))
    x = V.dof_coords
    vec = np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
    plot_eigenvector(V, vec, out_name=str(tmp_path / "vec.png"))
    assert (tmp_path / "vec.png").exists()
    plot(V, vec, out_name=str(tmp_path / "field.png"))
    plot_pts(np.random.RandomState(0).rand(10, 2), values=np.arange(10.0),
             out_name=str(tmp_path / "pts.png"))
    assert (tmp_path / "pts.png").exists()
    # angle video falls back to png frames without ffmpeg; either output is ok
    rng = np.random.RandomState(1)
    bases = [np.linalg.qr(rng.randn(20, 4))[0] for _ in range(3)]
    out = subspace_angle_video(bases, out_name=str(tmp_path / "angles.mp4"))
    assert out is not None


def test_collective_operator_parity():
    A = jnp.asarray(np.random.RandomState(0).randn(6, 6))
    op = CollectiveOperator(lambda X: A @ X, NullCollective(), mpi_op="avg")
    X = jnp.asarray(np.random.RandomState(1).randn(6, 3))
    np.testing.assert_allclose(np.asarray(op.matmat(X)), np.asarray(A @ X))
    np.testing.assert_allclose(np.asarray(op(X)), np.asarray(A @ X))
    mm = MatrixMultCollectiveOperator(lambda X: A @ X, NullCollective())
    np.testing.assert_allclose(np.asarray(mm.matMvMult(X)), np.asarray(A @ X))


def test_phase_timer_and_trace(tmp_path):
    from hippyflow_tpu.utils import PhaseTimer, trace

    timer = PhaseTimer(verbose=False)
    with timer.phase("alpha") as h:
        h["result"] = jnp.ones(4) * 2.0
    with timer.phase("beta"):
        pass
    assert set(timer.timings) == {"alpha", "beta"}
    assert timer.counts["alpha"] == 1
    report = timer.report()
    assert "alpha" in report and "beta" in report
    with trace(str(tmp_path / "trace")):
        jnp.ones(3).sum()
