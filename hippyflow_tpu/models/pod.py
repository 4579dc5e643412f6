"""Proper orthogonal decomposition of observable samples.

Re-implements `hippyflow/modeling/PODProjector.py`:

* ``PODProjector``          — sampled E[q q^T] + randomized HEP (doublePass),
  plus training-data generation with resume;
* ``PODProjectorFromData``  — dense, data-matrix POD with mass-weighted inner
  product in three variants (hep / ghep / inverse_ghep) and optional mean
  shift (`PODProjector.py:666-852`).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..fem import mass_matrix, stiffness_matrix
from ..ops.linalg import CholeskyFactor, eigh_descending, generalized_eigh
from ..ops.randomized import double_pass
from ..ops.operators import low_rank_operator, prior_preconditioned_projector
from ..parallel import NullCollective
from ..utils import ParameterList, KeyChain
from .sampling import sample_until_solved


def PODParameterList() -> ParameterList:
    """Mirrors `PODProjector.py:35-49`."""
    return ParameterList(
        {
            "sample_per_process": [100, "Number of samples per process"],
            "rank": [128, "Rank of POD subspace"],
            "oversampling": [10, "Oversampling for randomized algorithms"],
            "data_per_process": [250, "Training data points per process"],
            "verbose": [True, "Print progress"],
            "output_directory": [None, "output directory"],
            "plot_label_suffix": ["", "plot label suffix"],
            "save_and_plot": [False, "save arrays/plots"],
            "chunk_size": [None, "sample-batch chunk size (None = auto)"],
            "coarse_warm_start": [
                None,
                "grid sequencing: batched noise -> u0 map built by "
                "fem.multigrid.coarse_newton_warm_start",
            ],
            "seed": [0, "PRNG seed"],
        }
    )


class PODProjector:
    """POD subspace of the observable map output (reference
    `PODProjector.py:52-654`)."""

    def __init__(
        self,
        observable,
        prior,
        control_distribution=None,
        collective=None,
        parameters: ParameterList | None = None,
    ):
        self.observable = observable
        self.prior = prior
        self.control_distribution = control_distribution
        self.collective = collective or NullCollective()
        self.parameters = parameters or PODParameterList()
        self.keychain = KeyChain(self.parameters["seed"])
        self.d = None
        self.U_MV = None
        self.u_at_mean = None
        self.samples = None
        self._subspace_construction_time = None
        self._data_generation_time = None

    def solve_at_mean(self):
        """Forward solve at the prior mean (reference `PODProjector.py:102`)."""
        z = None
        if self.control_distribution is not None:
            z = self.control_distribution.sample_n(self.keychain.next_key(), 1)[0]
        u, _ = self.observable.problem.solve_fwd(self.prior.mean, z=z)
        self.u_at_mean = u
        return u

    def _ensure_samples(self, n):
        if self.samples is not None and self.samples.qs.shape[0] >= n:
            return
        self.samples = sample_until_solved(
            self.observable,
            self.prior,
            self.keychain,
            n,
            control_distribution=self.control_distribution,
            chunk_size=self.parameters["chunk_size"],
            verbose=self.parameters["verbose"],
            collective=self.collective,
            coarse_warm_start=self.parameters["coarse_warm_start"],
        )

    def construct_subspace(self):
        """Randomized HEP of (1/N) sum_i q_i q_i^T (doublePass), matching
        `PODProjector.py:331-389`. Returns (d, decoder, encoder)."""
        t0 = time.time()
        n = self.parameters["sample_per_process"]
        self._ensure_samples(n)
        Q = self.samples.qs[:n]  # (N, dQ)
        N, dQ = Q.shape
        op = low_rank_operator(jnp.full((N,), 1.0 / N, dtype=Q.dtype), Q.T)
        r = min(self.parameters["rank"], dQ)
        nvec = min(r + self.parameters["oversampling"], dQ)
        Omega = self.keychain.normal((dQ, nvec), dtype=Q.dtype)
        self.d, self.U_MV = double_pass(op, Omega, r, s=1)
        self._subspace_construction_time = time.time() - t0
        if self.parameters["verbose"]:
            print(
                f"POD subspace construction took {self._subspace_construction_time:.3f}s"
            )
        if self.parameters["save_and_plot"] and self.parameters["output_directory"]:
            outdir = self.parameters["output_directory"]
            os.makedirs(outdir, exist_ok=True)
            np.save(os.path.join(outdir, "POD_projector"), np.asarray(self.U_MV))
            np.save(os.path.join(outdir, "POD_d"), np.asarray(self.d))
            try:
                from ..utils.plotting import spectrum_plot

                spectrum_plot(
                    np.asarray(self.d),
                    axis_label=[
                        "i", r"$\lambda_i$",
                        r"Eigenvalues of $\mathbb{E}_{\nu}[qq^T]$"
                        + self.parameters["plot_label_suffix"],
                    ],
                    out_name=os.path.join(
                        outdir, f"POD_eigenvalues_{self.parameters['rank']}.pdf"
                    ),
                )
            except Exception:
                pass
        return self.d, self.U_MV, self.U_MV

    def generate_training_data(
        self, output_directory="data/", n_data: int | None = None, check_for_data=True
    ):
        """Sample (m_i, q_i) pairs and store them in the reference's npz
        schema, resumable chunk-by-chunk (`PODProjector.py:118-222`).

        Resume granularity matches the reference's per-sample .npy scan
        (`PODProjector.py:147-186`): finished chunks persist under
        ``<output_directory>/chunks_pod/`` and a killed run restarts at the
        first missing chunk, not from zero."""
        t0 = time.time()
        os.makedirs(output_directory, exist_ok=True)
        n = n_data or self.parameters["data_per_process"]
        out_path = os.path.join(output_directory, "mq_data.npz")
        if check_for_data and os.path.exists(out_path):
            existing = np.load(out_path)
            if existing["m_data"].shape[0] >= n:
                if self.parameters["verbose"]:
                    print("training data already generated, skipping")
                return existing["m_data"], existing["q_data"]

        chunk_dir = os.path.join(output_directory, "chunks_pod")
        os.makedirs(chunk_dir, exist_ok=True)
        from .sampling import auto_chunk_size

        chunk_size = self.parameters["chunk_size"] or auto_chunk_size(
            self.observable.problem.state_dim,
            self.prior.mean.dtype,
            problem=self.observable.problem,
        )
        from .data_generator import (
            chunk_keychain,
            load_chunks_validated,
            prune_stale_chunks,
        )

        # resume at the first gap; stale chunks beyond it (possibly from a
        # different chunk grid) are deleted so the final concatenation
        # cannot duplicate samples.  A from-scratch run (check_for_data=
        # False) must clear the directory outright: leftover chunks from an
        # earlier grid would otherwise fail tiling validation only AFTER
        # the full regeneration.
        if check_for_data:
            i = prune_stale_chunks(chunk_dir)
        else:
            import shutil

            shutil.rmtree(chunk_dir, ignore_errors=True)
            os.makedirs(chunk_dir, exist_ok=True)
            i = 0
        if i > 0 and self.parameters["verbose"]:
            print(f"resuming training-data generation at sample {i}")
        while i < n:
            b = min(chunk_size, n - i)
            # per-chunk deterministic keys (tag 1 = POD training data):
            # restarted runs reproduce an uninterrupted run bit-for-bit
            batch = sample_until_solved(
                self.observable,
                self.prior,
                chunk_keychain(self.parameters["seed"], 1, i),
                b,
                control_distribution=self.control_distribution,
                chunk_size=b,
                verbose=self.parameters["verbose"],
                coarse_warm_start=self.parameters["coarse_warm_start"],
                collective=self.collective,
            )
            payload = {
                "m_data": np.asarray(batch.ms),
                "q_data": np.asarray(batch.qs),
            }
            if batch.zs is not None:
                payload["z_data"] = np.asarray(batch.zs)
            np.savez(os.path.join(chunk_dir, f"chunk_{i}_{i + b}.npz"), **payload)
            i += b

        cat = {k: v[:n] for k, v in load_chunks_validated(chunk_dir, n).items()}
        np.savez_compressed(out_path, **cat)
        import shutil

        shutil.rmtree(chunk_dir, ignore_errors=True)
        self._data_generation_time = time.time() - t0
        return cat["m_data"], cat["q_data"]

    def save_mass_and_stiffness_matrices(self, output_directory=None):
        """Save the state-space mass and stiffness matrices as scipy CSR npz
        (reference `PODProjector.py:298-327` artifact schema: mass_csr.npz,
        stiffness_csr.npz)."""
        import scipy.sparse as sp

        outdir = output_directory or self.parameters["output_directory"]
        assert outdir is not None, "set output_directory"
        os.makedirs(outdir, exist_ok=True)
        Vu = self.observable.problem.Vu
        M = np.asarray(mass_matrix(Vu))
        K = np.asarray(stiffness_matrix(Vu))
        sp.save_npz(os.path.join(outdir, "mass_csr"), sp.csr_matrix(M))
        sp.save_npz(os.path.join(outdir, "stiffness_csr"), sp.csr_matrix(K))

    def two_state_solution(self, output_directory=None):
        """Solve at the prior mean and at one prior sample; save both
        parameter/state pairs under two_states/ (reference
        `PODProjector.py:481-537`, .npy instead of .pvd)."""
        outdir = output_directory or self.parameters["output_directory"]
        assert outdir is not None, "set output_directory"
        save_dir = os.path.join(outdir, "two_states")
        os.makedirs(save_dir, exist_ok=True)

        m_mean = self.prior.mean
        z = None
        if self.control_distribution is not None:
            if hasattr(self.control_distribution, "mean"):
                z = self.control_distribution.mean
            else:
                z = self.control_distribution.sample_n(self.keychain.next_key(), 1)[0]
        u_at_mean, _ = self.observable.problem.solve_fwd(m_mean, z=z)
        if self.parameters["verbose"]:
            print(f"||m_mean|| = {float(jnp.linalg.norm(m_mean)):.6e}")
            print(f"||u_at_mean|| = {float(jnp.linalg.norm(u_at_mean)):.6e}")

        noise = self.keychain.normal((1, self.prior.noise_dim), dtype=m_mean.dtype)
        m_sample = self.prior.sample(noise)[0]
        u_at_sample, _ = self.observable.problem.solve_fwd(m_sample, z=z)
        if self.parameters["verbose"]:
            print(f"||m_sample|| = {float(jnp.linalg.norm(m_sample)):.6e}")
            print(f"||u_at_sample|| = {float(jnp.linalg.norm(u_at_sample)):.6e}")

        np.save(os.path.join(save_dir, "m_mean"), np.asarray(m_mean))
        np.save(os.path.join(save_dir, "u_at_mean"), np.asarray(u_at_mean))
        np.save(os.path.join(save_dir, "m_sample"), np.asarray(m_sample))
        np.save(os.path.join(save_dir, "u_at_sample"), np.asarray(u_at_sample))
        # ParaView-readable companions (reference writes dolfin .pvd;
        # legacy .vtk opens identically — utils/mesh_utils.export_vtk)
        try:
            from ..utils.mesh_utils import export_vtk

            problem = self.observable.problem
            mesh_m = getattr(getattr(problem, "Vm", None), "mesh", None)
            mesh_u = getattr(getattr(problem, "Vu", None), "mesh", None)
            if mesh_m is not None:
                export_vtk(
                    os.path.join(save_dir, "m_mean"), mesh_m,
                    {"m": np.asarray(m_mean)},
                )
                export_vtk(
                    os.path.join(save_dir, "m_sample"), mesh_m,
                    {"m": np.asarray(m_sample)},
                )
            if mesh_u is not None:
                export_vtk(
                    os.path.join(save_dir, "u_at_mean"), mesh_u,
                    {"u": np.asarray(u_at_mean)},
                )
                export_vtk(
                    os.path.join(save_dir, "u_at_sample"), mesh_u,
                    {"u": np.asarray(u_at_sample)},
                )
        except (AssertionError, AttributeError) as e:
            if self.parameters["verbose"]:
                print(f"two_state_solution: vtk export skipped ({e})")
        return (m_mean, u_at_mean), (m_sample, u_at_sample)

    def input_output_error_test(self, V, Cinv_matmat=None, rank_pairs=((8, 8),)):
        """Joint input/output projection error test (reference
        `PODProjector.py:541-654`): project m onto the first rank_in columns
        of V, re-solve the forward map at the projected parameter, project the
        output onto the first rank_out POD vectors, and report the relative
        error  ||q(m) - U U^T q(P m)|| / ||q(m)||  over MC samples.

        V: (dM, >=max rank_in) input decoder; Cinv_matmat makes the input
        projector prior-preconditioned (V V^T C^{-1}); rank_pairs: list of
        (rank_in, rank_out).  Returns (avg list, std list)."""
        assert self.control_distribution is None, "not worked out for control"
        assert self.U_MV is not None and self.d is not None, "construct_subspace first"
        V = jnp.asarray(V)
        for rank_in, rank_out in rank_pairs:
            assert rank_in <= V.shape[1]
            assert rank_out <= self.U_MV.shape[1]

        n = self.parameters["sample_per_process"]
        self._ensure_samples(n)
        ms = self.samples.ms[:n]
        qs = self.samples.qs[:n]
        problem = self.observable.problem

        cache = getattr(self, "_io_error_cache", None)
        if cache is None:

            def resolve(m_proj):
                u, info = problem.solve_fwd(m_proj)
                return self.observable.evalu(u)

            cache = jax.jit(jax.vmap(resolve))
            self._io_error_cache = cache

        avg, std = [], []
        for rank_in, rank_out in rank_pairs:
            Vr = V[:, :rank_in]
            if Cinv_matmat is not None:
                proj = prior_preconditioned_projector(Vr, Cinv_matmat)
            else:
                proj = low_rank_operator(jnp.ones(rank_in, dtype=V.dtype), Vr)
            m_proj = proj(ms.T).T
            q_red = cache(m_proj)
            U = self.U_MV[:, :rank_out]
            q_out = (U @ (U.T @ q_red.T)).T
            errs = jnp.linalg.norm(qs - q_out, axis=1) / jnp.linalg.norm(qs, axis=1)
            avg.append(self.collective.allReduce(float(errs.mean()), "avg"))
            std.append(
                float(np.sqrt(self.collective.allReduce(float(errs.std()) ** 2, "avg")))
            )
            if self.parameters["verbose"]:
                print(
                    f"Rank pair ({rank_in},{rank_out}): avg rel error = {avg[-1]:.4e}"
                )
        return avg, std

    def test_output_errors(self, ranks=(8, 16, 32, 64), n_samples: int | None = None):
        """MC relative projection error of fresh observable samples onto the
        POD basis (reference `PODProjector.py:392-478`)."""
        assert self.U_MV is not None, "construct_subspace first"
        n = n_samples or self.parameters["sample_per_process"]
        self._ensure_samples(n)
        Q = self.samples.qs[:n]
        avg, std = [], []
        for r in ranks:
            U = self.U_MV[:, :r]
            P = (U @ (U.T @ Q.T)).T
            errs = jnp.linalg.norm(Q - P, axis=1) / jnp.linalg.norm(Q, axis=1)
            avg.append(float(errs.mean()))
            std.append(float(errs.std()))
            if self.parameters["verbose"]:
                print(f"POD avg rel error = {avg[-1]:.4e} at rank {r}")
        return np.asarray(avg), np.asarray(std)


def weighted_l2_norm_vector(x, W):
    """Column-wise W-weighted norms (reference `PODProjector.py:658-661`)."""
    Wx = W @ x
    return jnp.sqrt(jnp.einsum("ij,ij->j", Wx, x))


class PODProjectorFromData:
    """Dense POD from a data matrix with M-weighted inner product
    (reference `PODProjector.py:666-852`).

    The reference's scipy eigsh/splu paths map onto dense symmetric
    eigensolves via Cholesky congruence — the TPU-friendly formulation; the
    'hep' path (data-Gram eigendecomposition) is retained verbatim as it is
    already optimal when n_data << dim_u.
    """

    def __init__(self, Vu, M_output=None):
        if isinstance(Vu, (list, tuple)):
            Vu = Vu[0]  # reference passes the Vh list and indexes hp.STATE
        self.Vu = Vu
        if M_output is None:
            self.M = mass_matrix(Vu)
        else:
            self.M = jnp.asarray(M_output)
        self._M_chol = CholeskyFactor(L=jnp.linalg.cholesky(self.M))

    def construct_subspace(
        self, u_data, u_rank: int, shifted: bool = True, method: str = "hep",
        verify: bool = False
    ):
        """Returns (d, phi, Mphi, u_shift); phi M-orthonormal, Mphi = M phi."""
        u_data = jnp.asarray(u_data)
        n_data, dim_u = u_data.shape
        assert u_rank <= n_data, "need more samples than the requested rank"

        if shifted:
            u_shift = jnp.mean(u_data, axis=0)
            u_data = u_data - u_shift[None, :]
        else:
            u_shift = jnp.zeros(dim_u, dtype=u_data.dtype)

        X = u_data.T  # (dim_u, n_data)
        t0 = time.time()
        if method == "hep":
            # Gram eigendecomposition: X^T M X (n_data x n_data)
            G = X.T @ (self.M @ X)
            d_all, Ug = eigh_descending(G)
            d = d_all[:u_rank] / n_data
            phi = X @ Ug[:, :u_rank]
            phi = phi / weighted_l2_norm_vector(phi, self.M)[None, :]
            Mphi = self.M @ phi
        elif method == "ghep":
            # H phi = d M phi with H = (M X)(M X)^T / n
            MX = self.M @ X
            H = (MX @ MX.T) / n_data
            d_all, V = generalized_eigh(H, self.M, descending=True)
            d = d_all[:u_rank]
            phi = V[:, :u_rank]
            Mphi = self.M @ phi
        elif method == "inverse_ghep":
            # H v = d M^{-1} v with H = X X^T / n and v = M phi:
            # congruence S = L^T H L, v = L y, phi = M^{-1} v.
            L = self._M_chol.L
            H = (X @ X.T) / n_data
            S = L.T @ H @ L
            S = 0.5 * (S + S.T)
            d_all, Y = eigh_descending(S)
            d = d_all[:u_rank]
            Mphi = L @ Y[:, :u_rank]
            phi = self._M_chol.solve(Mphi)
        else:
            raise ValueError(f"unavailable method {method!r}")

        if verify:
            u_rank_verify = u_rank - 1 if shifted else u_rank
            pv = phi[:, :u_rank_verify]
            orth = jnp.linalg.norm(pv.T @ (self.M @ pv) - jnp.eye(u_rank_verify))
            print(f"Basis Orthogonality error: {float(orth)}")
            recon = X - pv @ (Mphi[:, :u_rank_verify].T @ X)
            rel = weighted_l2_norm_vector(recon, self.M) / weighted_l2_norm_vector(
                X, self.M
            )
            print(f"Mean reconstruction error: {float(rel.mean()):.3e}")
            print(f"Max reconstruction error: {float(rel.max()):.3e}")
        return d, phi, Mphi, u_shift
