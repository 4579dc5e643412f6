"""Karhunen-Loeve expansion of the prior covariance.

Re-implements `hippyflow/modeling/KLEProjector.py` with the same three
orthogonality modes:

* 'mass'     — randomized GHEP of M C M against M (doublePassG), decoder
               M-orthonormal, encoder = M @ decoder;
* 'prior'    — exact dense GHEP of (K, M) replacing the SLEPc Krylov-Schur
               shift-invert solver (`KLEProjector.py:296-316`): covariance
               eigenvalues are 1/lambda(K,M)^2, decoder columns scaled by
               1/lambda, encoder = R @ decoder (R-orthonormal basis);
* 'identity' — randomized HEP of C = R^{-1} (doublePass), l2-orthonormal.
"""

from __future__ import annotations

import os
import time

import jax.numpy as jnp
import numpy as np

from ..fem import boundary_mass_matrix
from ..ops.linalg import CholeskyFactor, generalized_eigh
from ..ops.randomized import double_pass, double_pass_g, lanczos_ghep, orthogonalize
from ..ops.operators import prior_preconditioned_projector, low_rank_operator
from ..parallel import NullCollective
from ..utils import ParameterList, KeyChain


class MassPreconditionedCovarianceOperator:
    """Block-operator M C M (reference `KLEProjector.py:47-69`): the prior
    covariance preconditioned by the mass matrix, the GHEP left-hand side of
    the mass-orthogonal KLE mode.  Exposes ``matmat`` on (n, j) blocks."""

    def __init__(self, C_matmat, M_matmat):
        self.C_matmat = C_matmat
        self.M_matmat = M_matmat

    def matmat(self, X):
        return self.M_matmat(self.C_matmat(self.M_matmat(X)))

    __call__ = matmat


def KLEParameterList() -> ParameterList:
    """Mirrors `KLEProjector.py:30-45`."""
    return ParameterList(
        {
            "error_test_samples": [50, "Number of samples for error test"],
            "rank": [128, "Rank of subspace"],
            "oversampling": [10, "Oversampling for randomized algorithms"],
            "verbose": [True, "Print progress"],
            "output_directory": [None, "output directory for arrays/plots"],
            "plot_label_suffix": ["", "suffix for plot label"],
            "save_and_plot": [False, "save and plot or not"],
            "input_decoder_name": ["KLE_decoder", "naming"],
            "seed": [0, "PRNG seed"],
        }
    )


class KLEProjector:
    """Input subspace projector based solely on the prior."""

    def __init__(self, prior, collective=None, parameters: ParameterList | None = None):
        self.prior = prior
        self.collective = collective or NullCollective()
        self.parameters = parameters or KLEParameterList()
        self.keychain = KeyChain(self.parameters["seed"])
        self.d_KLE = None
        self.V_KLE = None
        self.M_orthogonal = None
        self._subspace_construction_time = None

    def random_input_projector(self):
        """Orthonormalized Gaussian basis (reference `KLEProjector.py:114-128`)."""
        r = self.parameters["rank"] + self.parameters["oversampling"]
        Omega = self.keychain.normal((self.prior.dim, r), dtype=self.prior.mean.dtype)
        return orthogonalize(Omega)

    def construct_input_subspace(self, orthogonality: str = "mass"):
        """Compute the KLE subspace; returns (d, decoder, encoder)."""
        t0 = time.time()
        prior = self.prior
        r = self.parameters["rank"]
        p = self.parameters["oversampling"]
        Omega = self.keychain.normal((prior.dim, r + p), dtype=prior.mean.dtype)

        mode = orthogonality.lower()
        if mode == "mass":
            kle_op = MassPreconditionedCovarianceOperator(
                prior.Rsolver_matmat, prior.M_matmat
            )
            self.d_KLE, self.V_KLE = double_pass_g(
                kle_op, prior.M_matmat, prior.Msolver_matmat, Omega, r, s=1
            )
            self.M_orthogonal = True
            kle_decoder = self.V_KLE
            kle_encoder = prior.M_matmat(kle_decoder)
        elif mode == "prior":
            constructor = KLESubspaceConstructor(prior)
            self.d_KLE, kle_decoder, kle_encoder = constructor.compute_kle_subspace(r)
            self.V_KLE = kle_decoder
            self.M_orthogonal = False
        elif mode == "identity":
            self.d_KLE, self.V_KLE = double_pass(prior.Rsolver_matmat, Omega, r, s=1)
            self.M_orthogonal = False
            kle_decoder = self.V_KLE
            kle_encoder = kle_decoder
        else:
            raise ValueError(f"unknown orthogonality {orthogonality!r}")

        self._subspace_construction_time = time.time() - t0
        if self.parameters["verbose"]:
            print(
                f"KLE subspace construction took {self._subspace_construction_time:.3f}s"
            )
        self._save()
        return self.d_KLE, kle_decoder, kle_encoder

    def test_errors(self, ranks=(8, 16, 32, 64), cut_off: float = 1e-12):
        """MC projection error of prior samples onto the KLE basis
        (reference `KLEProjector.py:202-282`), vectorized over samples."""
        assert len(ranks) > 0, "test_errors needs at least one rank"
        if self.d_KLE is None or len(self.d_KLE) < max(ranks):
            self.parameters["rank"] = max(max(ranks), self.parameters["rank"])
            self.construct_input_subspace()
        d = np.asarray(self.d_KLE)
        numerical_rank = int(np.where(d > cut_off)[0][-1]) + 1 if (d > cut_off).any() else 0
        ranks = [r for r in sorted(ranks) if r <= numerical_rank]

        n = self.parameters["error_test_samples"]
        noise = self.keychain.normal((n, self.prior.noise_dim), dtype=self.prior.mean.dtype)
        samples = self.prior.sample(noise)  # (n, dM)

        avg, std = [], []
        for r in ranks:
            V = self.V_KLE[:, :r]
            if self.M_orthogonal:
                proj = prior_preconditioned_projector(V, self.prior.M_matmat)
            else:
                proj = low_rank_operator(jnp.ones(r, dtype=V.dtype), V)
            P = proj(samples.T).T
            errs = jnp.linalg.norm(samples - P, axis=1) / jnp.linalg.norm(
                samples, axis=1
            )
            avg.append(float(errs.mean()))
            std.append(float(errs.std()))
            if self.parameters["verbose"]:
                print(f"KLE naive avg rel error = {avg[-1]:.4e} at rank {r}")
        return np.asarray(avg), np.asarray(std)

    def _save(self):
        if not self.parameters["save_and_plot"]:
            return
        outdir = self.parameters["output_directory"]
        if outdir is None:
            return
        os.makedirs(outdir, exist_ok=True)
        np.save(
            os.path.join(outdir, self.parameters["input_decoder_name"]),
            np.asarray(self.V_KLE),
        )
        np.save(os.path.join(outdir, "KLE_d"), np.asarray(self.d_KLE))
        try:
            from ..utils.plotting import spectrum_plot

            spectrum_plot(
                np.asarray(self.d_KLE),
                axis_label=[
                    "i", r"$\lambda_i$",
                    "Eigenvalues of $C$" + self.parameters["plot_label_suffix"],
                ],
                out_name=os.path.join(
                    outdir, f"KLE_eigenvalues_{self.parameters['rank']}.pdf"
                ),
            )
        except Exception:
            pass


class KLESubspaceConstructor:
    """Prior-orthonormal KLE basis from the GHEP  A v = lambda M v on the
    prior's elliptic operator.

    TPU-native replacement for the reference's `KLESubspaceConstructorSLEPc`
    (`KLEProjector.py:285-334`, Krylov-Schur + shift-and-invert at 0): for
    small problems a dense generalized eigendecomposition; beyond
    ``dense_cutoff`` dofs a shift-invert Lanczos (`ops.randomized.lanczos_ghep`)
    reusing the prior's Cholesky of A as the inverse.  Covariance eigenvalues
    are 1/lambda^2; decoder columns are scaled by 1/lambda so that the decoder
    is C^{-1}-orthonormal; encoder = R @ decoder."""

    def __init__(self, prior, dense_cutoff: int = 2048):
        assert hasattr(prior, "A") and hasattr(prior, "M")
        self.prior = prior
        self.dense_cutoff = dense_cutoff

    def compute_kle_subspace(self, rank: int):
        """Returns (covariance eigenvalues (rank,), decoder, encoder)."""
        prior = self.prior
        if prior.dim <= self.dense_cutoff:
            d_all, V_all = generalized_eigh(prior.A, prior.M, descending=False)
            lam = d_all[:rank]
            V = V_all[:, :rank]
        else:
            v0 = jnp.ones(prior.dim, dtype=prior.mean.dtype)
            # A^{-1}: K-solve for the BiLaplacian (A = K), R-solve for the
            # Laplacian prior (A = R).
            Ainv = getattr(prior, "Ksolver_matmat", None) or prior.Rsolver_matmat
            lam, V = lanczos_ghep(
                Ainv, prior.M_matmat, v0, rank, m_iters=2 * rank + 20
            )
        covariance_eigenvalues = 1.0 / lam**2
        kle_decoder = V / lam[None, :]
        kle_encoder = prior.R_matmat(kle_decoder)
        return covariance_eigenvalues, kle_decoder, kle_encoder


class BoundaryRestrictedKLEProjector:
    """Prior-based KLE projector for boundary data (reference
    `KLEProjector.py:337-434`): GHEP of the boundary-mass-preconditioned
    covariance M_b C M_b against the nullspace-filled boundary mass B =
    M_b + I_interior, solved with doublePassG.  The decoder is B-orthonormal
    and supported (up to the covariance's smoothing) on boundary dofs;
    encoder = M_b @ decoder."""

    def __init__(self, prior, parameters: ParameterList | None = None):
        self.prior = prior
        self.parameters = parameters or KLEParameterList()
        self.keychain = KeyChain(self.parameters["seed"])
        self.Vh = prior.Vh

        self.M_b = self.make_boundary_restricted_mass_matrix(fill_nullspace=False)
        self.B = self.make_boundary_restricted_mass_matrix(fill_nullspace=True)
        self._B_chol = CholeskyFactor(L=jnp.linalg.cholesky(self.B))
        self.KLE_operator = MassPreconditionedCovarianceOperator(
            prior.Rsolver_matmat, lambda X: self.M_b @ X
        )

    def make_boundary_restricted_mass_matrix(self, fill_nullspace: bool = False):
        """Boundary mass matrix int_dOmega u v ds; with ``fill_nullspace`` the
        zero interior diagonal is replaced by the identity so the matrix is
        invertible (reference `KLEProjector.py:364-398`)."""
        Mb = boundary_mass_matrix(self.Vh, dtype=self.prior.mean.dtype)
        if fill_nullspace:
            interior = jnp.isclose(jnp.diag(Mb), 0.0).astype(Mb.dtype)
            Mb = Mb + jnp.diag(interior)
        return Mb

    def construct_input_subspace(self):
        """Returns (d, decoder, encoder); decoder B-orthonormal."""
        rank = self.parameters["rank"]
        oversampling = self.parameters["oversampling"]
        Omega = self.keychain.normal(
            (self.prior.dim, rank + oversampling), dtype=self.prior.mean.dtype
        )
        d_KLE, decoder = double_pass_g(
            self.KLE_operator,
            lambda X: self.B @ X,
            self._B_chol.solve,
            Omega,
            rank,
            s=1,
        )
        encoder = self.M_b @ decoder
        return d_KLE, decoder, encoder
