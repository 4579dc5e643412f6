"""Block-tridiagonal structured solver vs dense factorization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hippyflow_tpu as hf
from hippyflow_tpu.ops import factorize, factorize_block_tridiag_dense


def _assembled_operator(nx=12, symmetric=True):
    mesh = hf.unit_square_mesh(nx)
    V = hf.FunctionSpace(mesh)
    if symmetric:
        A = hf.stiffness_matrix(V) + 2.0 * hf.mass_matrix(V)
    else:
        # add a skew advection-like perturbation preserving the sparsity
        K = hf.stiffness_matrix(V)
        M = hf.mass_matrix(V)
        A = K + 2.0 * M + 0.3 * (jnp.triu(K) - jnp.tril(K))
    return V, A


@pytest.mark.parametrize("symmetric", [True, False])
def test_block_tridiag_matches_dense(symmetric):
    V, A = _assembled_operator(12, symmetric)
    s = V.mesh.structured_shape[0] + 1
    fac_bt = factorize_block_tridiag_dense(A, s)
    fac_dense = factorize(A, symmetric=False)
    b = jax.random.normal(jax.random.PRNGKey(0), (V.dim, 3))
    np.testing.assert_allclose(
        np.asarray(fac_bt.solve(b)), np.asarray(fac_dense.solve(b)), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(fac_bt.solve(b, trans=True)),
        np.asarray(fac_dense.solve(b, trans=True)),
        rtol=1e-9,
    )
    # single-vector path
    np.testing.assert_allclose(
        np.asarray(fac_bt.solve(b[:, 0])),
        np.asarray(fac_dense.solve(b[:, 0])),
        rtol=1e-9,
    )


def test_block_tridiag_vmap():
    V, A = _assembled_operator(8, True)
    s = V.mesh.structured_shape[0] + 1
    A_batch = jnp.stack([A, A * 1.5, A + 0.1 * hf.mass_matrix(V)])
    facs = jax.vmap(lambda a: factorize_block_tridiag_dense(a, s))(A_batch)
    b = jax.random.normal(jax.random.PRNGKey(1), (V.dim,))
    xs = jax.vmap(lambda f: f.solve(b))(facs)
    for i, Ai in enumerate(A_batch):
        np.testing.assert_allclose(
            np.asarray(Ai @ xs[i]), np.asarray(b), atol=1e-9
        )


def test_problem_uses_block_tridiag_and_matches_dense_solver():
    """Same Poisson problem solved with both solver paths: identical."""
    from hippyflow_tpu.testing import (
        poisson_control_settings,
        setup_poisson_control_problem,
        make_poisson_varf,
    )

    settings = poisson_control_settings()
    settings["nx"] = settings["ny"] = 10
    pde_auto, prior, control_dist, Vh = setup_poisson_control_problem(settings)
    assert pde_auto._use_block_tridiag

    import hippyflow_tpu as hf

    pde_dense = hf.VariationalPDEProblem(
        Vh,
        Vh,
        make_poisson_varf(settings),
        pde_auto.bc,
        is_fwd_linear=True,
        control_dim=25,
        solver="dense",
    )
    assert not pde_dense._use_block_tridiag
    m = prior.sample_n(jax.random.PRNGKey(0), 1)[0]
    z = control_dist.sample_n(jax.random.PRNGKey(1), 1)[0]
    u1, _ = pde_auto.solve_fwd(m, z=z)
    u2, _ = pde_dense.solve_fwd(m, z=z)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-10)

    # Jacobian actions agree too (incremental fwd/adj through the factor)
    from hippyflow_tpu.models import LinearStateObservable, ObservableJacobian
    from hippyflow_tpu.testing import poisson_pointwise_observable

    obs1 = poisson_pointwise_observable(pde_auto, Vh, n_obs=6)
    obs2 = poisson_pointwise_observable(pde_dense, Vh, n_obs=6)
    lin1 = obs1.linearize(m, z=z)
    lin2 = obs2.linearize(m, z=z)
    dm = jax.random.normal(jax.random.PRNGKey(2), (Vh.dim,))
    J1 = ObservableJacobian(obs1).mult(lin1, dm)
    J2 = ObservableJacobian(obs2).mult(lin2, dm)
    np.testing.assert_allclose(np.asarray(J1), np.asarray(J2), atol=1e-10)


def test_prior_block_tridiag_consistency():
    """Structured-mesh prior (block-Thomas K solves) matches the dense-path
    algebra: R Rsolver = I and sampling covariance exact."""
    V = hf.FunctionSpace(hf.unit_square_mesh(10))
    prior = hf.BiLaplacianPrior(V, gamma=0.2, delta=2.0)
    from hippyflow_tpu.ops import BlockTridiagFactor

    assert isinstance(prior._K_chol, BlockTridiagFactor)
    X = jax.random.normal(jax.random.PRNGKey(0), (V.dim, 4))
    err = jnp.linalg.norm(prior.R_matmat(prior.Rsolver_matmat(X)) - X)
    assert float(err / jnp.linalg.norm(X)) < 1e-9


class TestBlockCyclic:
    """Cyclic reduction agrees with dense solves (fwd + transpose) on
    nonsymmetric block-tridiagonal systems of awkward sizes."""

    @pytest.mark.parametrize("nb,s", [(1, 4), (2, 3), (5, 4), (8, 3), (65, 5)])
    def test_matches_dense(self, nb, s):
        from hippyflow_tpu.ops import factorize_block_cyclic

        rng = np.random.RandomState(nb * 100 + s)
        n = nb * s
        D = rng.randn(nb, s, s) + 4.0 * np.eye(s)  # diagonally dominant
        L = 0.3 * rng.randn(nb, s, s)
        B = 0.3 * rng.randn(nb, s, s)
        L[0] = 0.0
        B[-1] = 0.0
        A = np.zeros((n, n))
        for j in range(nb):
            A[j * s : (j + 1) * s, j * s : (j + 1) * s] = D[j]
            if j > 0:
                A[j * s : (j + 1) * s, (j - 1) * s : j * s] = L[j]
            if j < nb - 1:
                A[j * s : (j + 1) * s, (j + 1) * s : (j + 2) * s] = B[j]

        fac = factorize_block_cyclic(
            jnp.asarray(D), jnp.asarray(L), jnp.asarray(B), with_transpose=True
        )
        b = rng.randn(n)
        x = np.asarray(fac.solve(jnp.asarray(b)))
        np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-9, atol=1e-10)
        xt = np.asarray(fac.solve(jnp.asarray(b), trans=True))
        np.testing.assert_allclose(
            xt, np.linalg.solve(A.T, b), rtol=1e-9, atol=1e-10
        )
        # block rhs
        Bk = rng.randn(n, 7)
        Xk = np.asarray(fac.solve(jnp.asarray(Bk)))
        np.testing.assert_allclose(
            Xk, np.linalg.solve(A, Bk), rtol=1e-9, atol=1e-10
        )

    def test_banded_roundtrip_and_vmap(self):
        from hippyflow_tpu.ops import factorize_block_cyclic_banded

        rng = np.random.RandomState(3)
        nb, s, batch = 9, 4, 6
        band = 0.2 * rng.randn(batch, nb, s, 3 * s)
        for i in range(batch):
            band[i, :, :, s : 2 * s] += 3.0 * np.eye(s)
            band[i, 0, :, :s] = 0.0
            band[i, -1, :, 2 * s :] = 0.0
        rhs = rng.randn(batch, nb * s)

        sol = jax.vmap(
            lambda bd, r: factorize_block_cyclic_banded(bd).solve(r)
        )(jnp.asarray(band), jnp.asarray(rhs))
        # dense check per sample
        for i in range(batch):
            A = np.zeros((nb * s, nb * s))
            for j in range(nb):
                A[j * s : (j + 1) * s, j * s : (j + 1) * s] = band[i, j, :, s : 2 * s]
                if j > 0:
                    A[j * s : (j + 1) * s, (j - 1) * s : j * s] = band[i, j, :, :s]
                if j < nb - 1:
                    A[j * s : (j + 1) * s, (j + 1) * s : (j + 2) * s] = band[
                        i, j, :, 2 * s :
                    ]
            np.testing.assert_allclose(
                np.asarray(sol[i]), np.linalg.solve(A, rhs[i]), rtol=1e-8, atol=1e-9
            )

    def test_no_transpose_asserts(self):
        from hippyflow_tpu.ops import factorize_block_cyclic

        rng = np.random.RandomState(0)
        D = rng.randn(4, 3, 3) + 4.0 * np.eye(3)
        Z = np.zeros_like(D)
        fac = factorize_block_cyclic(
            jnp.asarray(D), jnp.asarray(Z), jnp.asarray(Z), with_transpose=False
        )
        with pytest.raises(AssertionError):
            fac.solve(jnp.ones(12), trans=True)

    def test_adjoint_only(self):
        """with_forward=False: transpose solves match the full factorization,
        forward solves assert (Jacobian materialization's factor mode)."""
        from hippyflow_tpu.ops import factorize_block_cyclic

        rng = np.random.RandomState(5)
        nb, s = 6, 4
        D = rng.randn(nb, s, s) + 4.0 * np.eye(s)
        L = 0.3 * rng.randn(nb, s, s)
        B = 0.3 * rng.randn(nb, s, s)
        L[0] = 0.0
        B[-1] = 0.0
        args = (jnp.asarray(D), jnp.asarray(L), jnp.asarray(B))
        fac_full = factorize_block_cyclic(*args, with_transpose=True)
        fac_adj = factorize_block_cyclic(*args, with_forward=False)
        b = jnp.asarray(rng.randn(nb * s, 3))
        np.testing.assert_array_equal(
            np.asarray(fac_adj.solve(b, trans=True)),
            np.asarray(fac_full.solve(b, trans=True)),
        )
        with pytest.raises(AssertionError):
            fac_adj.solve(b)


class TestPallasInverse:
    """Gauss-Jordan Pallas kernel (interpret mode on CPU) vs jnp.linalg.inv."""

    def test_matches_xla(self):
        from hippyflow_tpu.ops.pallas_kernels import batched_inverse

        rng = np.random.RandomState(0)
        X = rng.randn(13, 9, 9) + 6.0 * np.eye(9)
        out = batched_inverse(jnp.asarray(X), force="pallas")
        np.testing.assert_allclose(
            np.asarray(out), np.linalg.inv(X), rtol=1e-9, atol=1e-11
        )

    def test_solver_precision_policy_does_not_leak_into_kernel(self):
        """Mosaic lowers only DEFAULT/HIGHEST dot precision; an ambient
        jax.default_matmul_precision('high') (the solver precision policy)
        must not reach the kernel's dot_general (regression: the round-4
        precision probe crashed the TPU lowering with 'Unsupported dot
        precision: HIGH')."""
        from hippyflow_tpu.ops.pallas_kernels import batched_inverse

        rng = np.random.RandomState(2)
        X = jnp.asarray(rng.randn(8, 9, 9) + 6.0 * np.eye(9))

        def allowed(prec):
            if prec is None:
                return True
            seq = prec if isinstance(prec, tuple) else (prec,)
            return all(p == jax.lax.Precision.HIGHEST for p in seq)

        def check_eqns(jaxpr):
            for eqn in jaxpr.eqns:
                if eqn.primitive.name == "dot_general":
                    assert allowed(eqn.params.get("precision")), (
                        f"kernel dot_general leaked precision "
                        f"{eqn.params.get('precision')}"
                    )
                for v in eqn.params.values():
                    inner = getattr(v, "jaxpr", v)
                    if hasattr(inner, "eqns"):
                        check_eqns(inner)

        with jax.default_matmul_precision("high"):
            closed = jax.make_jaxpr(
                lambda x: batched_inverse(x, force="pallas")
            )(X)
            out = batched_inverse(X, force="pallas")
        check_eqns(closed.jaxpr)
        np.testing.assert_allclose(
            np.asarray(out), np.linalg.inv(np.asarray(X)), rtol=1e-9, atol=1e-11
        )

    def test_vmap_batching(self):
        from hippyflow_tpu.ops.pallas_kernels import batched_inverse

        rng = np.random.RandomState(1)
        X = rng.randn(4, 6, 5, 5) + 5.0 * np.eye(5)
        out = jax.vmap(lambda x: batched_inverse(x, force="pallas"))(
            jnp.asarray(X)
        )
        np.testing.assert_allclose(
            np.asarray(out), np.linalg.inv(X), rtol=1e-9, atol=1e-11
        )

    def test_fem_diagonal_blocks(self):
        """The kernel's no-pivot assumption holds on actual assembled
        diagonal blocks (bc-symmetrized confusion operator)."""
        from applications.confusion import confusion_form
        from hippyflow_tpu.fem import (
            DirichletBC, FunctionSpace, band_bc_masks, bc_symmetrize_banded,
            unit_square_mesh,
        )
        from hippyflow_tpu.models import VariationalPDEProblem
        from hippyflow_tpu.ops.pallas_kernels import batched_inverse

        V = FunctionSpace(unit_square_mesh(8))
        bc = DirichletBC.from_predicate(V, None, 0.0)
        pde = VariationalPDEProblem(V, V, confusion_form(V), bc,
                                    is_fwd_linear=False)
        s = pde._block_size
        band = pde.bound.assemble_A_banded(
            jnp.zeros(V.dim), jnp.zeros(V.dim), None, s
        )
        band = bc_symmetrize_banded(band, *band_bc_masks(bc, s, band.dtype))
        D = band[:, :, s : 2 * s]
        out = batched_inverse(D, force="pallas")
        np.testing.assert_allclose(
            np.asarray(out), np.linalg.inv(np.asarray(D)), rtol=1e-7, atol=1e-9
        )


def test_blocked_inverse_variants_match_lu():
    """The blocked Gauss-Jordan alternatives (plain-XLA `blocked_inverse`
    and the small-pivot helper) match LU inverses on well-conditioned
    blocks (f64)."""
    from hippyflow_tpu.ops.pallas_kernels import blocked_inverse, _small_gj_inverse

    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.standard_normal((24, 21, 21)) + 9.0 * np.eye(21))
    ref = jnp.linalg.inv(X)
    np.testing.assert_allclose(
        np.asarray(blocked_inverse(X, bs=8)), np.asarray(ref), rtol=1e-9, atol=1e-10
    )
    S = jnp.asarray(rng.standard_normal((10, 6, 6)) + 6.0 * np.eye(6))
    np.testing.assert_allclose(
        np.asarray(_small_gj_inverse(S)), np.asarray(jnp.linalg.inv(S)),
        rtol=1e-9, atol=1e-10,
    )


class TestInverseThomas:
    """`factorize_thomas_inv_banded` (the default forward structured
    factorization since the usage-split, `pde_problem.py:233-248`) agrees
    with dense solves in BOTH directions — its trans solve is what a
    Thomas-factored Jacobian stage would ride."""

    @pytest.mark.parametrize("nb,s", [(1, 4), (2, 3), (5, 4), (8, 3), (65, 5)])
    def test_matches_dense_fwd_and_trans(self, nb, s):
        from hippyflow_tpu.ops.structured import factorize_thomas_inv_banded

        rng = np.random.RandomState(nb * 77 + s)
        n = nb * s
        D = rng.randn(nb, s, s) + 4.0 * np.eye(s)
        L = 0.3 * rng.randn(nb, s, s)
        B = 0.3 * rng.randn(nb, s, s)
        L[0] = 0.0
        B[-1] = 0.0
        A = np.zeros((n, n))
        for j in range(nb):
            A[j * s : (j + 1) * s, j * s : (j + 1) * s] = D[j]
            if j > 0:
                A[j * s : (j + 1) * s, (j - 1) * s : j * s] = L[j]
            if j < nb - 1:
                A[j * s : (j + 1) * s, (j + 1) * s : (j + 2) * s] = B[j]
        band = jnp.concatenate(
            [jnp.asarray(L), jnp.asarray(D), jnp.asarray(B)], axis=-1
        )

        fac = factorize_thomas_inv_banded(band)
        b = rng.randn(n)
        np.testing.assert_allclose(
            np.asarray(fac.solve(jnp.asarray(b))),
            np.linalg.solve(A, b), rtol=1e-9, atol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(fac.solve(jnp.asarray(b), trans=True)),
            np.linalg.solve(A.T, b), rtol=1e-9, atol=1e-10,
        )
        Bk = rng.randn(n, 7)
        np.testing.assert_allclose(
            np.asarray(fac.solve(jnp.asarray(Bk), trans=True)),
            np.linalg.solve(A.T, Bk), rtol=1e-9, atol=1e-10,
        )

    def test_vmap_and_cr_agreement(self):
        """vmapped Thomas factors match vmapped CR on a batch of bands
        (the production composition: jax.vmap over the sample axis)."""
        from hippyflow_tpu.ops.structured import (
            factorize_block_cyclic_banded,
            factorize_thomas_inv_banded,
        )

        rng = np.random.RandomState(5)
        Bn, nb, s = 3, 9, 4
        band = 0.3 * rng.randn(Bn, nb, s, 3 * s)
        for i in range(Bn):
            band[i, :, :, s : 2 * s] += 4.0 * np.eye(s)
            band[i, 0, :, :s] = 0.0
            band[i, -1, :, 2 * s :] = 0.0
        band = jnp.asarray(band)
        rhs = jnp.asarray(rng.randn(Bn, nb * s, 6))

        ft = jax.vmap(factorize_thomas_inv_banded)(band)
        fc = jax.vmap(
            lambda bd: factorize_block_cyclic_banded(bd, with_transpose=True)
        )(band)
        for trans in (False, True):
            xt = jax.vmap(lambda f, r: f.solve(r, trans=trans))(ft, rhs)
            xc = jax.vmap(lambda f, r: f.solve(r, trans=trans))(fc, rhs)
            np.testing.assert_allclose(
                np.asarray(xt), np.asarray(xc), rtol=1e-9, atol=1e-10
            )


class TestMixedPrecisionRefinement:
    """Mixed-precision banded-solve policy (VERDICT r4 item 1): lowered
    matmul precision inside factorize/solve + iterative refinement."""

    def _band(self, nb=9, s=4, seed=3):
        rng = np.random.RandomState(seed)
        band = 0.3 * rng.randn(nb, s, 3 * s)
        band[:, :, s : 2 * s] += 4.0 * np.eye(s)
        band[0, :, :s] = 0.0
        band[-1, :, 2 * s :] = 0.0
        return jnp.asarray(band)

    def test_trans_matmat_matches_forward_of_transpose(self):
        from hippyflow_tpu.ops.structured import (
            _transpose_band,
            block_tridiag_matmat,
            block_tridiag_matmat_trans,
        )

        band = self._band()
        s = band.shape[1]
        X = jnp.asarray(np.random.RandomState(0).randn(band.shape[0] * s, 5))
        a_t, d_t, b_t = _transpose_band(
            band[:, :, :s], band[:, :, s : 2 * s], band[:, :, 2 * s :]
        )
        band_t = jnp.concatenate([a_t, d_t, b_t], axis=2)
        np.testing.assert_allclose(
            np.asarray(block_tridiag_matmat_trans(band, X)),
            np.asarray(block_tridiag_matmat(band_t, X)),
            rtol=1e-12, atol=1e-13,
        )
        # single-vector path
        np.testing.assert_allclose(
            np.asarray(block_tridiag_matmat_trans(band, X[:, 0])),
            np.asarray(block_tridiag_matmat(band_t, X[:, 0])),
            rtol=1e-12, atol=1e-13,
        )

    def test_refined_factor_solves_and_vmaps(self):
        from hippyflow_tpu.ops.structured import (
            RefinedBandFactor,
            block_tridiag_matmat,
            block_tridiag_matmat_trans,
            factorize_thomas_inv_banded,
        )

        band = self._band()
        n = band.shape[0] * band.shape[1]
        rhs = jnp.asarray(np.random.RandomState(1).randn(n, 3))
        fac = RefinedBandFactor(factorize_thomas_inv_banded(band), band, 2)
        for trans, mm in ((False, block_tridiag_matmat),
                          (True, block_tridiag_matmat_trans)):
            x = fac.solve(rhs, trans=trans)
            np.testing.assert_allclose(
                np.asarray(mm(band, x)), np.asarray(rhs), atol=1e-11
            )
        # vmap over a batch of factors (the production composition)
        bands = jnp.stack([self._band(seed=i) for i in range(3)])
        facs = jax.vmap(
            lambda bd: RefinedBandFactor(
                factorize_thomas_inv_banded(bd), bd, 1
            )
        )(bands)
        rhs_b = jnp.asarray(np.random.RandomState(2).randn(3, n, 2))
        xs = jax.jit(jax.vmap(lambda f, r: f.solve(r)))(facs, rhs_b)
        for i in range(3):
            np.testing.assert_allclose(
                np.asarray(block_tridiag_matmat(bands[i], xs[i])),
                np.asarray(rhs_b[i]), atol=1e-10,
            )

    def test_policy_hooks_into_problem_factors(self):
        """set_solver_precision(refine_steps=1) makes _assemble_factorize
        return refinement-wrapped factors whose solves still match the exact
        path (CPU: precision contexts are no-ops, so this checks plumbing)."""
        import hippyflow_tpu as hf
        from hippyflow_tpu import config as hf_config
        from hippyflow_tpu.ops.structured import RefinedBandFactor
        from hippyflow_tpu.testing import (
            make_poisson_varf,
            poisson_control_settings,
            setup_poisson_control_problem,
        )

        settings = poisson_control_settings()
        settings["nx"] = settings["ny"] = 8
        pde, prior, control_dist, Vh = setup_poisson_control_problem(settings)
        m = prior.sample(jax.random.normal(jax.random.PRNGKey(0), (Vh.dim,)))
        z = control_dist.sample_n(jax.random.PRNGKey(1), 1)[0]
        u_ref, _ = pde.solve_fwd(m, z)
        lin_ref = pde.linearize(u_ref, m, z)
        rhs = jax.random.normal(jax.random.PRNGKey(2), (Vh.dim, 3))
        prev = hf_config.set_solver_precision("high", refine_steps=1)
        try:
            fac = pde._assemble_factorize(u_ref, m, z)
            assert isinstance(fac, RefinedBandFactor)
            u2, info2 = pde.solve_fwd(m, z)
            assert bool(info2.converged)
            np.testing.assert_allclose(
                np.asarray(u2), np.asarray(u_ref), rtol=1e-8, atol=1e-10
            )
            lin2 = pde.linearize(u_ref, m, z)
            for adj in (False, True):
                a = np.asarray(pde.solve_incremental(lin_ref, rhs, is_adj=adj))
                b = np.asarray(pde.solve_incremental(lin2, rhs, is_adj=adj))
                np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-11)
        finally:
            hf_config.set_solver_precision(*prev)


class TestAutoSolverGeometry:
    """'auto' splits the structured factorization by usage AND band
    geometry (measured on v5e, benchmarks/probe_helm_fused.py /
    probe_jac192.py): forward solves always take inverse-Thomas; adjoint
    factorizations take cyclic reduction only in the small-block/long-band
    regime (s < 128 and nb > 64) where CR's log2(nb) recursion beats the
    nb latency-bound scan steps.  MXU-sized blocks or short bands flip to
    inverse-Thomas, whose single factor set serves fwd+trans solves."""

    def _poisson(self, n):
        from hippyflow_tpu.testing import (
            poisson_control_settings,
            setup_poisson_control_problem,
        )

        settings = poisson_control_settings()
        settings["nx"] = settings["ny"] = n
        pde, *_ = setup_poisson_control_problem(settings)
        return pde

    def test_lane_geometries_pick_thomas_adjoint(self):
        """Round-5 rule: inverse-Thomas serves the adjoint at every real
        lane geometry (measured in probe_pallas_band.py); CR remains only
        for extreme long-thin bands (nb > 256 with small blocks)."""
        pde = self._poisson(70)  # s=71, nb=71
        assert pde._structured_solver == "thomas_inv"
        assert pde._structured_solver_fwd == "thomas_inv"

    def test_short_band_picks_thomas_inv(self):
        pde = self._poisson(20)  # s=21, nb=21 <= 64
        assert pde._structured_solver == "thomas_inv"

    def test_large_block_picks_thomas_inv(self):
        """The helmholtz P2 split-complex ordered band (s=2*2*(2*nx+1))
        crosses the s >= 128 boundary already at nx=16."""
        from applications.helmholtz import helmholtz_linear_observable

        obs, _ = helmholtz_linear_observable(nx=16, frequency=150.0)
        p = obs.problem
        assert p._block_size >= 128
        assert p._structured_solver == "thomas_inv"

    def test_explicit_choice_overrides_geometry(self):
        from applications.helmholtz import helmholtz_linear_observable

        obs, _ = helmholtz_linear_observable(
            nx=16, frequency=150.0, solver="block_cyclic"
        )
        assert obs.problem._structured_solver == "block_cyclic"
        assert obs.problem._structured_solver_fwd == "block_cyclic"


class TestPallasBandedSolve:
    """Fused Pallas sweep solve (`banded_solve_batch`) vs the XLA scan
    (interpret mode on CPU; on TPU the same kernels run compiled via the
    `config.set_pallas_band_solve` routing)."""

    def _factors(self, nx=10, n_batch=3, k=5):
        from hippyflow_tpu.ops.structured import (
            factorize_thomas_inv_banded,
            _thomas_solve_scan,
        )
        from hippyflow_tpu.fem import bc_symmetrize_banded_from_mask

        V, A = _assembled_operator(nx, symmetric=False)
        s = V.mesh.structured_shape[0] + 1
        from hippyflow_tpu.ops.structured import extract_block_tridiag

        D, L_A, B = extract_block_tridiag(A, s)
        band = jnp.concatenate([L_A, D, B], axis=2)  # (nb, s, 3s)
        scales = jnp.asarray([1.0, 1.4, 0.8][:n_batch])
        bands = scales[:, None, None, None] * band[None]
        facs = jax.vmap(factorize_thomas_inv_banded)(bands)
        nb = band.shape[0]
        rhs = jax.random.normal(jax.random.PRNGKey(3), (n_batch, nb, s, k))
        return facs, rhs, _thomas_solve_scan

    @pytest.mark.parametrize("trans", [False, True])
    def test_interpret_matches_scan(self, trans):
        from hippyflow_tpu.ops.pallas_kernels import banded_solve_batch

        facs, rhs, scan = self._factors()
        want = jax.vmap(lambda M, D, B, r: scan(M, D, B, r, trans))(
            facs.M, facs.Dinv, facs.B, rhs
        )
        got = banded_solve_batch(
            facs.M, facs.Dinv, facs.B, rhs, trans, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-12, atol=1e-12
        )

    def test_routing_is_off_on_cpu(self):
        """On the CPU backend the custom_vmap rule must keep the scan: the
        routed solve equals the scan bitwise."""
        from hippyflow_tpu import config
        from hippyflow_tpu.ops.structured import (
            _thomas_solve_fwd_cv,
            _thomas_solve_scan,
        )

        facs, rhs, _ = self._factors()
        prev = config.set_pallas_band_solve("on")
        try:
            got = jax.vmap(_thomas_solve_fwd_cv)(facs.M, facs.Dinv, facs.B, rhs)
        finally:
            config.set_pallas_band_solve(prev)
        want = jax.vmap(
            lambda M, D, B, r: _thomas_solve_scan(M, D, B, r, False)
        )(facs.M, facs.Dinv, facs.B, rhs)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_routing_caps_block_size(self, monkeypatch):
        """Blocks above config.pallas_band_max_block stay on the scan even
        on the TPU backend: the fused kernels' in-kernel Gauss-Jordan
        unrolls ~s steps into the Mosaic program, and at the helmholtz
        lane's s=516 the remote compile ran >25 min vs the scan lane's
        49 s (round-5 regression, now gated)."""
        from hippyflow_tpu import config
        from hippyflow_tpu.ops import structured

        monkeypatch.setattr(
            structured.jax, "default_backend", lambda: "tpu"
        )
        assert structured._pallas_band_solve_wanted(200, 193)
        assert not structured._pallas_band_solve_wanted(200, 516)
        assert not structured._pallas_band_solve_wanted(1, 193)  # k<8 auto
        prev = config.set_pallas_band_max_block(600)
        try:
            assert structured._pallas_band_solve_wanted(200, 516)
        finally:
            config.set_pallas_band_max_block(prev)
        prev = config.set_pallas_band_solve("off")
        try:
            assert not structured._pallas_band_solve_wanted(200, 193)
        finally:
            config.set_pallas_band_solve(prev)

    @pytest.mark.parametrize("trans", [False, True])
    def test_interpret_solves_the_system(self, trans):
        """End-to-end: kernel output actually solves A x = b / A^T x = b."""
        from hippyflow_tpu.ops.pallas_kernels import banded_solve_batch

        V, A = _assembled_operator(10, symmetric=False)
        s = V.mesh.structured_shape[0] + 1
        from hippyflow_tpu.ops.structured import (
            extract_block_tridiag,
            factorize_thomas_inv_banded,
        )

        D, L_A, B = extract_block_tridiag(A, s)
        band = jnp.concatenate([L_A, D, B], axis=2)
        fac = factorize_thomas_inv_banded(band)
        nb = band.shape[0]
        rhs = jax.random.normal(jax.random.PRNGKey(4), (1, nb, s, 4))
        x = banded_solve_batch(
            fac.M[None], fac.Dinv[None], fac.B[None], rhs, trans,
            interpret=True,
        )
        op = A.T if trans else A
        got = op @ np.asarray(x[0]).reshape(V.dim, 4)
        np.testing.assert_allclose(
            got, np.asarray(rhs[0]).reshape(V.dim, 4), atol=1e-8
        )


class TestPallasBandedFactorize:
    """Fused Pallas factorization (`banded_factorize_batch`) vs the XLA
    scan factorization, interpret mode on CPU."""

    def test_interpret_matches_scan(self):
        from hippyflow_tpu.ops.pallas_kernels import banded_factorize_batch
        from hippyflow_tpu.ops.structured import (
            _factorize_thomas_inv_banded,
            extract_block_tridiag,
        )

        V, A = _assembled_operator(10, symmetric=False)
        s = V.mesh.structured_shape[0] + 1
        D, L_A, B = extract_block_tridiag(A, s)
        band = jnp.concatenate([L_A, D, B], axis=2)
        scales = jnp.asarray([1.0, 1.3, 0.7])
        bands = scales[:, None, None, None] * band[None]
        want = jax.vmap(_factorize_thomas_inv_banded)(bands)
        M, Dinv = banded_factorize_batch(bands, interpret=True)
        np.testing.assert_allclose(
            np.asarray(M), np.asarray(want.M), rtol=1e-11, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(Dinv), np.asarray(want.Dinv), rtol=1e-10, atol=1e-11
        )
        # and the fused factor solves the system end-to-end
        from hippyflow_tpu.ops.structured import InverseThomasFactor

        fac = InverseThomasFactor(M=M[0], Dinv=Dinv[0], B=B)
        rhs = jax.random.normal(jax.random.PRNGKey(5), (V.dim, 3))
        x = fac.solve(rhs, trans=True)
        np.testing.assert_allclose(
            np.asarray(A.T @ x), np.asarray(rhs), atol=1e-8
        )
