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

from ..ops.linalg import generalized_eigh
from ..ops.randomized import double_pass, double_pass_g, orthogonalize
from ..ops.operators import prior_preconditioned_projector, low_rank_operator
from ..parallel import NullCollective
from ..utils import ParameterList, KeyChain


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
            # MassPreconditionedCovarianceOperator M C M (`KLEProjector.py:47-69`)
            kle_op = lambda X: prior.M_matmat(prior.Rsolver_matmat(prior.M_matmat(X)))
            self.d_KLE, self.V_KLE = double_pass_g(
                kle_op, prior.M_matmat, prior.Msolver_matmat, Omega, r, s=1
            )
            self.M_orthogonal = True
            kle_decoder = self.V_KLE
            kle_encoder = prior.M_matmat(kle_decoder)
        elif mode == "prior":
            # Exact GHEP K v = lambda M v; smallest lambda <-> largest
            # covariance eigenvalue 1/lambda^2 (`KLEProjector.py:310-334`).
            d_all, V_all = generalized_eigh(prior.A, prior.M, descending=False)
            lam = d_all[:r]
            V = V_all[:, :r]
            self.d_KLE = 1.0 / lam**2
            kle_decoder = V / lam[None, :]
            kle_encoder = prior.R_matmat(kle_decoder)
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
