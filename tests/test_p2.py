"""P2 Lagrange elements: basis exactness, assembly, solves, observation.

The reference gets P2 from FEniCS (`helmholtz_linear_observable.py:70` uses a
P2 state space); here the quadratic element is native."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hippyflow_tpu.fem import (
    DirichletBC,
    FunctionSpace,
    GalerkinForm,
    assemble_pointwise_observation,
    mass_matrix,
    stiffness_matrix,
    unit_square_mesh,
    vector_to_function,
)
from hippyflow_tpu.models import (
    LinearStateObservable,
    PointwiseObservation,
    VariationalPDEProblem,
)


@pytest.fixture(scope="module")
def V2():
    return FunctionSpace(unit_square_mesh(8), degree=2)


def test_dof_layout(V2):
    mesh = V2.mesh
    ne = V2._edge_data[0].shape[0]
    assert V2.dim == mesh.num_vertices + ne
    assert V2.cell_dofs.shape == (mesh.num_cells, 6)
    # dof coords: edge dofs are midpoints
    edges = V2._edge_data[0]
    mids = 0.5 * (mesh.vertices[edges[:, 0]] + mesh.vertices[edges[:, 1]])
    np.testing.assert_allclose(V2.dof_coords[mesh.num_vertices:], mids)


def test_partition_of_unity_and_mass(V2):
    # sum of P2 basis functions == 1 everywhere -> row sums of M = areas
    M = np.asarray(mass_matrix(V2))
    assert abs(M.sum() - 1.0) < 1e-12  # total area of unit square
    ones = np.ones(V2.dim)
    np.testing.assert_allclose(M @ ones, M.sum(axis=1), atol=1e-15)
    # stiffness annihilates constants
    K = np.asarray(stiffness_matrix(V2))
    assert np.abs(K @ ones).max() < 1e-12


def test_quadratic_exactness(V2):
    """P2 interpolation and pointwise observation are exact for quadratics."""
    f = lambda x: 1.0 + 2.0 * x[:, 0] - x[:, 1] + 3.0 * x[:, 0] * x[:, 1] \
        - 0.5 * x[:, 0] ** 2 + 0.25 * x[:, 1] ** 2
    dofs = V2.interpolate(f)
    pts = np.random.RandomState(0).uniform(0.05, 0.95, (30, 2))
    B = assemble_pointwise_observation(V2, pts)
    np.testing.assert_allclose(B @ dofs, f(pts), atol=1e-12)
    g = vector_to_function(V2, dofs)
    np.testing.assert_allclose(g(pts), f(pts), atol=1e-12)


def test_poisson_p2_exact_for_quadratic_solution(V2):
    """Laplace(u) = 2 (weak form residual flux=gu, source=+2) with u = x^2
    on the boundary has the exact solution u = x^2, which P2 represents
    exactly: the discrete solution matches to solver precision."""
    u_exact = lambda x: x[:, 0] ** 2
    bc = DirichletBC.from_predicate(V2, None, u_exact)
    form = GalerkinForm(
        flux=lambda x, u, gu, m, z, c: gu,
        source=lambda x, u, gu, m, z, c: 2.0,
        quad_degree=3,
        symmetric=True,
    )
    Vm = FunctionSpace(V2.mesh)  # P1 parameter space
    pde = VariationalPDEProblem(V2, Vm, form, bc, is_fwd_linear=True)
    u, info = pde.solve_fwd(jnp.zeros(Vm.dim))
    np.testing.assert_allclose(
        np.asarray(u), u_exact(V2.dof_coords), atol=1e-9
    )


@pytest.mark.slow
def test_p2_convergence_rate():
    """L2 error of the P2 Poisson solve converges ~ h^3 (one order better
    than P1)."""
    u_exact = lambda x: np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
    rhs = lambda xq: 2.0 * np.pi**2

    errs = []
    for nx in (4, 8, 16):
        V = FunctionSpace(unit_square_mesh(nx), degree=2)
        Vm = FunctionSpace(V.mesh)
        bc = DirichletBC.from_predicate(V, None, 0.0)
        form = GalerkinForm(
            flux=lambda x, u, gu, m, z, c: gu,
            source=lambda x, u, gu, m, z, c: -2.0
            * jnp.pi**2
            * jnp.sin(jnp.pi * x[0])
            * jnp.sin(jnp.pi * x[1]),
            quad_degree=5,
            symmetric=True,
        )
        pde = VariationalPDEProblem(V, Vm, form, bc, is_fwd_linear=True)
        u, _ = pde.solve_fwd(jnp.zeros(Vm.dim))
        M = mass_matrix(V)
        e = jnp.asarray(np.asarray(u) - u_exact(V.dof_coords))
        errs.append(float(jnp.sqrt(e @ (M @ e))))
    rate = np.log2(errs[0] / errs[1]), np.log2(errs[1] / errs[2])
    assert rate[0] > 2.7 and rate[1] > 2.7, (errs, rate)


@pytest.mark.slow
def test_p2_state_p1_parameter_jacobian_adjoint():
    """Mixed spaces: P2 state, P1 parameter — Jacobian/adjoint consistency
    <J dm, dq> == <dm, J^T dq> and agreement with finite differences."""
    V2 = FunctionSpace(unit_square_mesh(6), degree=2)
    Vm = FunctionSpace(V2.mesh)
    bc = DirichletBC.from_predicate(V2, None, 0.0)
    form = GalerkinForm(
        flux=lambda x, u, gu, m, z, c: jnp.exp(m) * gu,
        source=lambda x, u, gu, m, z, c: u**3 - 1.0,
        quad_degree=4,
    )
    pde = VariationalPDEProblem(V2, Vm, form, bc, is_fwd_linear=False)
    B = PointwiseObservation(V2, np.array([[0.3, 0.4], [0.62, 0.55]]))
    obs = LinearStateObservable(pde, B)
    from hippyflow_tpu.models import ObservableJacobian

    rng = np.random.RandomState(0)
    m = jnp.asarray(0.2 * rng.randn(Vm.dim))
    lin = obs.linearize(m)
    J = ObservableJacobian(obs)
    dm = jnp.asarray(rng.randn(Vm.dim))
    dq = jnp.asarray(rng.randn(obs.dQ))
    lhs = float(J.mult(lin, dm) @ dq)
    rhs = float(dm @ J.transpmult(lin, dq))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)
    # finite difference check
    eps = 1e-6
    qp = obs.eval(m + eps * dm)
    qm = obs.eval(m - eps * dm)
    fd = np.asarray((qp - qm) / (2 * eps))
    np.testing.assert_allclose(np.asarray(J.mult(lin, dm)), fd, rtol=1e-5, atol=1e-8)
