"""FEM layer unit tests: assembly exactness, solves, observation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hippyflow_tpu.fem import (
    DirichletBC,
    FunctionSpace,
    GalerkinForm,
    assemble_pointwise_observation,
    boundary_mass_matrix,
    mass_matrix,
    stiffness_matrix,
    unit_square_mesh,
)
from hippyflow_tpu.models import VariationalPDEProblem


@pytest.fixture(scope="module")
def V16():
    return FunctionSpace(unit_square_mesh(16))


def test_mass_matrix_total(V16):
    M = mass_matrix(V16)
    assert abs(float(M.sum()) - 1.0) < 1e-12
    # symmetric
    assert float(jnp.abs(M - M.T).max()) == 0.0


def test_stiffness_annihilates_linears(V16):
    K = stiffness_matrix(V16)
    f = V16.interpolate(lambda x: 2.0 * x[:, 0] + 3.0 * x[:, 1] - 1.0)
    r = np.asarray(K @ jnp.asarray(f))
    interior = ~V16.mesh.boundary_mask
    assert np.abs(r[interior]).max() < 1e-12


def test_stiffness_energy_of_linear(V16):
    # int |grad u|^2 for u = x is 1 on the unit square
    K = stiffness_matrix(V16)
    f = jnp.asarray(V16.interpolate(lambda x: x[:, 0]))
    assert abs(float(f @ K @ f) - 1.0) < 1e-12


def test_boundary_mass_total(V16):
    # perimeter of unit square = 4
    Mb = boundary_mass_matrix(V16)
    assert abs(float(Mb.sum()) - 4.0) < 1e-12


def test_pointwise_observation_exact_on_linears(V16):
    targets = np.array([[0.33, 0.41], [0.5, 0.5], [0.875, 0.125]])
    B = assemble_pointwise_observation(V16, targets)
    f = V16.interpolate(lambda x: 4.0 * x[:, 0] - 2.0 * x[:, 1] + 0.5)
    expected = 4.0 * targets[:, 0] - 2.0 * targets[:, 1] + 0.5
    assert np.abs(B @ f - expected).max() < 1e-12


@pytest.mark.slow
def test_poisson_manufactured_solution():
    # -div(e^m grad u) = f with m = 0, u* = x(1-x)y(1-y)
    mesh = unit_square_mesh(32)
    V = FunctionSpace(mesh)

    def flux(x, u, gu, m, z, c):
        return jnp.exp(m) * gu

    def source(x, u, gu, m, z, c):
        return -(2.0 * (x[1] * (1 - x[1]) + x[0] * (1 - x[0])))

    form = GalerkinForm(flux=flux, source=source, quad_degree=4, symmetric=True)
    bc = DirichletBC.from_predicate(V, None, 0.0)
    prob = VariationalPDEProblem(V, V, form, bc, is_fwd_linear=True)
    u, info = prob.solve_fwd(jnp.zeros(V.dim))
    u_exact = V.interpolate(
        lambda x: x[:, 0] * (1 - x[:, 0]) * x[:, 1] * (1 - x[:, 1])
    )
    assert bool(info.converged)
    assert np.abs(np.asarray(u) - u_exact).max() < 1e-4


def test_inhomogeneous_dirichlet():
    # Laplace equation with u = y on the whole boundary -> u = y everywhere
    mesh = unit_square_mesh(12)
    V = FunctionSpace(mesh)
    form = GalerkinForm(
        flux=lambda x, u, gu, m, z, c: gu, quad_degree=2, symmetric=True
    )
    bc = DirichletBC.from_predicate(V, None, lambda x: x[:, 1])
    prob = VariationalPDEProblem(V, V, form, bc, is_fwd_linear=True)
    u, _ = prob.solve_fwd(jnp.zeros(V.dim))
    u_exact = V.interpolate(lambda x: x[:, 1])
    assert np.abs(np.asarray(u) - u_exact).max() < 1e-11


@pytest.mark.slow
def test_newton_matches_linear_on_linear_problem():
    # Newton on an affine residual must converge in one step to the linear solve
    mesh = unit_square_mesh(8)
    V = FunctionSpace(mesh)

    def flux(x, u, gu, m, z, c):
        return jnp.exp(m) * gu

    def source(x, u, gu, m, z, c):
        return -1.0

    form = GalerkinForm(flux=flux, source=source, quad_degree=3, symmetric=True)
    bc = DirichletBC.from_predicate(V, None, 0.0)
    m = 0.3 * jnp.asarray(V.interpolate(lambda x: np.sin(3 * x[:, 0])))
    lin = VariationalPDEProblem(V, V, form, bc, is_fwd_linear=True)
    nl = VariationalPDEProblem(V, V, form, bc, is_fwd_linear=False)
    u1, _ = lin.solve_fwd(m)
    u2, info = nl.solve_fwd(m)
    assert bool(info.converged)
    assert float(jnp.abs(u1 - u2).max()) < 1e-10


@pytest.mark.slow
def test_newton_nonlinear_reaction():
    mesh = unit_square_mesh(12)
    V = FunctionSpace(mesh)

    def flux(x, u, gu, m, z, c):
        return jnp.exp(m) * gu

    def source(x, u, gu, m, z, c):
        return u**3 - 10.0

    form = GalerkinForm(flux=flux, source=source, quad_degree=4, symmetric=True)
    bc = DirichletBC.from_predicate(V, None, 0.0)
    prob = VariationalPDEProblem(V, V, form, bc, is_fwd_linear=False)
    u, info = prob.solve_fwd(jnp.zeros(V.dim))
    assert bool(info.converged)
    assert float(info.residual_norm) < 1e-9
    # vmap over a parameter batch works and each lane converges
    ms = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (4, V.dim))
    us, infos = jax.vmap(lambda mm: prob.solve_fwd(mm))(ms)
    assert bool(infos.converged.all())


def test_cell_coefficients_and_field_coefficients():
    # advection by a constant field given as P1 coefficient: C(u) = v . grad u
    mesh = unit_square_mesh(8)
    V = FunctionSpace(mesh)
    vel = np.stack(
        [np.ones(V.dim), np.zeros(V.dim)], axis=1
    )  # constant velocity (1, 0)
    h = mesh.cell_diameters()

    def source(x, u, gu, m, z, c):
        return jnp.dot(c["vel"], gu) * c["h"]

    form = GalerkinForm(
        source=source,
        quad_degree=2,
        coefficients={"vel": vel},
        cell_coefficients={"h": h},
    )
    from hippyflow_tpu.fem import BoundGalerkinForm

    bound = BoundGalerkinForm(V, V, form)
    u = jnp.asarray(V.interpolate(lambda x: x[:, 0]))
    r = bound.residual(u, jnp.zeros(V.dim), None)
    # integrand = h * du/dx * phi_i = h * phi_i; total sum = sum_e h_e * |e|
    expected = (h * V.geometry.volumes).sum()
    assert abs(float(r.sum()) - expected) < 1e-12


def test_vector_to_function_and_operator_helpers():
    """hp contract shims: vector2Function analog, Solver2Operator, Transpose."""
    import numpy as np
    import jax.numpy as jnp

    from hippyflow_tpu.fem import FunctionSpace, unit_square_mesh, vector_to_function
    from hippyflow_tpu.ops import solver_to_operator, transpose_operator

    V = FunctionSpace(unit_square_mesh(8))
    x = V.mesh.vertices
    dofs = 2.0 * x[:, 0] - 0.5 * x[:, 1] + 1.0  # affine: exact under P1
    f = vector_to_function(V, dofs)
    pts = np.array([[0.33, 0.41], [0.77, 0.18]])
    np.testing.assert_allclose(
        f(pts), 2.0 * pts[:, 0] - 0.5 * pts[:, 1] + 1.0, atol=1e-12
    )

    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.randn(5, 5) + 5 * np.eye(5))
    op = solver_to_operator(lambda X: jnp.linalg.solve(A, X))
    X = jnp.asarray(rng.randn(5, 2))
    np.testing.assert_allclose(np.asarray(A @ op(X)), np.asarray(X), atol=1e-10)
    At = transpose_operator(A)
    np.testing.assert_allclose(np.asarray(At(X)), np.asarray(A.T @ X), atol=1e-14)


@pytest.mark.slow
def test_iterative_solver_matches_dense():
    """solver='iterative' (matrix-free Jacobi-BiCGStab) reproduces the dense
    path: linear solve, nonlinear Newton, and incremental fwd/adj solves."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from hippyflow_tpu.fem import (
        DirichletBC, FunctionSpace, GalerkinForm, unit_square_mesh,
    )
    from hippyflow_tpu.models import VariationalPDEProblem

    V = FunctionSpace(unit_square_mesh(10))
    bc = DirichletBC.from_predicate(V, None, 0.0)

    def make(solver, linear):
        def flux(x, u, gu, m, z, c):
            return jnp.exp(m) * gu

        def source(x, u, gu, m, z, c):
            return (0.0 if linear else u**3) - 1.0

        return VariationalPDEProblem(
            V, V, GalerkinForm(flux=flux, source=source), bc,
            is_fwd_linear=linear, solver=solver,
        )

    rng = np.random.RandomState(0)
    m = jnp.asarray(0.3 * rng.randn(V.dim))

    for linear in (True, False):
        pd = make("dense", linear)
        pi = make("iterative", linear)
        ud, infod = pd.solve_fwd(m)
        ui, infoi = pi.solve_fwd(m)
        assert bool(infoi.converged)
        np.testing.assert_allclose(np.asarray(ui), np.asarray(ud),
                                   rtol=1e-7, atol=1e-9)

    # incremental fwd/adj agree at the nonlinear solution
    pd, pi = make("dense", False), make("iterative", False)
    ud, _ = pd.solve_fwd(m)
    lind, lini = pd.linearize(ud, m), pi.linearize(ud, m)
    rhs = jnp.asarray(rng.randn(V.dim))
    np.testing.assert_allclose(
        np.asarray(pi.solve_incremental(lini, rhs)),
        np.asarray(pd.solve_incremental(lind, rhs)),
        rtol=1e-6, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(pi.solve_incremental(lini, rhs, is_adj=True)),
        np.asarray(pd.solve_incremental(lind, rhs, is_adj=True)),
        rtol=1e-6, atol=1e-8,
    )
    # block rhs
    RHS = jnp.asarray(rng.randn(V.dim, 3))
    np.testing.assert_allclose(
        np.asarray(lini.factor.solve(RHS)),
        np.asarray(lind.factor.solve(RHS)),
        rtol=1e-6, atol=1e-8,
    )
    # vmapped solves (batched samples)
    ms = jnp.asarray(0.2 * rng.randn(4, V.dim))
    us_i, infos = jax.vmap(pi.solve_fwd)(ms)
    us_d, _ = jax.vmap(pd.solve_fwd)(ms)
    assert bool(np.asarray(infos.converged).all())
    np.testing.assert_allclose(np.asarray(us_i), np.asarray(us_d),
                               rtol=1e-6, atol=1e-8)


def test_structured_scatter_free_assembly_matches_segment_sum():
    """Round-5 scatter-free assembly (diagonal slice-adds + stride-(3s+1)
    band composition) vs the segment-sum path: identical residual and band
    up to summation-order roundoff."""
    import jax
    import jax.numpy as jnp

    from hippyflow_tpu.testing import (
        poisson_control_settings,
        setup_poisson_control_problem,
    )

    settings = poisson_control_settings()
    settings["nx"] = settings["ny"] = 9
    pde, prior, control_dist, Vh = setup_poisson_control_problem(settings)
    bound = pde.bound
    plan = bound._structured_tables()
    assert plan is not None, "structured plan must build on rectangle_mesh"
    s = pde._block_size
    m = prior.sample_n(jax.random.PRNGKey(0), 1)[0]
    z = control_dist.sample_n(jax.random.PRNGKey(1), 1)[0]
    u = jax.random.normal(jax.random.PRNGKey(2), (Vh.dim,))

    # residual: structured vs segment-sum
    r_struct = bound.residual(u, m, z)
    r_e = bound._per_cell(bound._r_elem, u, m, z)
    r_seg = jax.ops.segment_sum(
        r_e.reshape(-1), bound.cells.reshape(-1), num_segments=bound.n
    )
    np.testing.assert_allclose(
        np.asarray(r_struct), np.asarray(r_seg), rtol=1e-13, atol=1e-14
    )

    # band: structured vs segment-sum
    band_struct = bound.assemble_A_banded(u, m, z, s)
    k = jax.jacfwd(bound._r_elem, argnums=0)
    A_e = bound._per_cell(k, u, m, z)
    idx = bound._band_indices(s)
    band_seg = jax.ops.segment_sum(
        A_e.reshape(-1), idx, num_segments=bound.n * 3 * s
    ).reshape(bound.n // s, s, 3 * s)
    np.testing.assert_allclose(
        np.asarray(band_struct), np.asarray(band_seg), rtol=1e-12, atol=1e-13
    )

    # and the band agrees with the dense assembly extracted to band storage
    from hippyflow_tpu.fem import bc_symmetrize_banded_from_mask
    from hippyflow_tpu.ops.structured import extract_block_tridiag

    A = bound.assemble_A(u, m, z)
    D, L, B = extract_block_tridiag(jnp.asarray(A), s)
    band_dense = jnp.concatenate([L, D, B], axis=2)
    np.testing.assert_allclose(
        np.asarray(band_struct), np.asarray(band_dense), rtol=1e-12, atol=1e-13
    )
