"""Training-data generation: (m_i, q_i) pairs plus derivative information.

Re-implements `hippyflow/modeling/dataGenerator.py` with identical artifact
schemas (mq_data.npz / mzq_data.npz, Jsvd_data.npz, JstarPhi_data.npz,
JPsi_data.npz, POD/ directory — `dataGenerator.py:634-655`) so downstream
surrogate-training code ports unchanged.

Execution model: samples are generated in vmapped chunks; each chunk's dense
Jacobians come from one blocked adjoint solve (see models/jacobian.py), and
the derivative artifacts (J^T Phi sketches, truncated SVDs) are batched
matmuls/SVDs.  Chunks are checkpointed to ``<data_dir>/chunks/`` so
generation is resumable, mirroring the reference's per-sample .npy scan
(`PODProjector.py:147-186`).
"""

from __future__ import annotations

import glob
import os
import re
import shutil
import time

import jax.numpy as jnp
import numpy as np

import jax

from ..utils import KeyChain
from .pod import PODProjectorFromData
from .observable import StateSpaceIdentityOperator
from .sampling import auto_chunk_size, materialize_jacobians, sample_until_solved


def data_generator_settings(settings: dict | None = None) -> dict:
    """Mirrors `dataGenerator.py:25-35`."""
    settings = dict(settings or {})
    settings.setdefault("rM", None)
    settings.setdefault("rZ", None)
    settings.setdefault("oversample", 10)
    settings.setdefault("reset_initial_guess", False)
    # grid sequencing: batched noise -> u0 map (fem.multigrid.
    # coarse_newton_warm_start); pure per-lane function of the noise, so
    # chunk resume stays bit-exact
    settings.setdefault("coarse_warm_start", None)
    settings.setdefault("save_failed_solves", True)
    settings.setdefault("verbose", True)
    settings.setdefault("chunk_size", None)
    settings.setdefault("seed", 0)
    return settings


def contiguous_prefix_end(done) -> int:
    """Largest e with chunks [0, e) contiguously covered by the sorted
    (start, end, path) records — resume restarts at the first GAP, not after
    the last chunk, so a deleted/corrupt early chunk is regenerated."""
    end = 0
    for a, b, _ in done:
        if a <= end < b:
            end = b
        elif a > end:
            break
    return end


def prune_stale_chunks(chunk_dir) -> int:
    """Resume hygiene: delete chunk files beyond the contiguous [0, e)
    prefix and return e.  The resume loop regenerates everything from the
    first gap with the CURRENT chunk grid (auto_chunk_size is
    device-memory-dependent), so chunks past the gap may overlap the new
    grid; left in place they would be concatenated at compress time,
    silently duplicating samples."""
    chunks = DataGenerator._scan_chunks(chunk_dir)
    end = contiguous_prefix_end(chunks)
    for a, b, f in chunks:
        if not (b <= end):
            os.remove(f)
    return end


def load_chunks_validated(chunk_dir, n: int | None = None) -> dict:
    """Load and concatenate chunk_*.npz files, asserting they tile [0, end)
    exactly: each chunk's start must equal the previous end (raise on
    overlap or gap) and, when ``n`` is given, coverage must reach n.
    Guards the consolidated artifacts against stale chunks from a resume
    under a different chunk grid."""
    chunks = DataGenerator._scan_chunks(chunk_dir)
    if not chunks:
        raise FileNotFoundError(f"no chunk files in {chunk_dir}")
    end = 0
    for a, b, f in chunks:
        if a != end or b <= a:
            kind = "overlap" if a < end else "gap"
            raise ValueError(
                f"chunk files do not tile contiguously ({kind} at sample {end}: "
                f"{os.path.basename(f)} covers [{a}, {b})); a resume under a "
                "different chunk size left stale chunks — delete "
                f"{chunk_dir} and regenerate"
            )
        end = b
    if n is not None and end < n:
        raise ValueError(
            f"chunk files cover only [0, {end}) of the requested {n} samples"
        )
    arrays: dict[str, list] = {}
    for _, _, f in chunks:
        with np.load(f) as z:
            for k in z.files:
                arrays.setdefault(k, []).append(z[k])
    return {k: np.concatenate(v) for k, v in arrays.items()}


def chunk_keychain(seed: int, tag: int, chunk_start: int) -> KeyChain:
    """Deterministic per-chunk PRNG stream: the chunk starting at sample
    ``chunk_start`` always draws the same noise, independent of process
    restarts, resampling retries in other chunks, or resume position —
    which is what makes chunk-granular resume produce bit-identical
    datasets to an uninterrupted run."""
    base = jax.random.fold_in(jax.random.PRNGKey(seed), tag)
    return KeyChain(jax.random.fold_in(base, chunk_start))


class DataGenerator:
    """Generates (m, q[, z]) data and Jacobian information."""

    def __init__(
        self,
        observable,
        prior,
        control_distribution=None,
        settings: dict | None = None,
    ):
        self.observable = observable
        self.prior = prior
        self.control_distribution = control_distribution
        self.settings = data_generator_settings(settings)
        self.keychain = KeyChain(self.settings["seed"])

    # ------------------------------------------------------------------
    def generate(
        self,
        n_samples: int,
        derivatives=(0, 0),
        output_decoder=None,
        output_encoder=None,
        input_decoder=None,
        input_encoder=None,
        data_dir: str = "data/test/",
        compress: bool = True,
        clean_up: bool = True,
    ):
        """Generate n_samples of (m, q[, z]) and derivative data.

        derivatives[0]: parameter Jacobian data — J^T MPhi when an
        output_decoder is given, J Psi for an input_decoder, else a
        truncated SVD at rank settings['rM'] (`dataGenerator.py:164-195`).
        derivatives[1]: same for the control Jacobian.
        """
        os.makedirs(data_dir, exist_ok=True)
        chunk_dir = os.path.join(data_dir, "chunks")
        os.makedirs(chunk_dir, exist_ok=True)
        has_z = self.control_distribution is not None
        chunk_size = self.settings["chunk_size"] or auto_chunk_size(
            self.observable.problem.state_dim,
            self.prior.mean.dtype,
            problem=self.observable.problem,
        )

        if output_decoder is not None and output_encoder is None:
            output_encoder = output_decoder
        if input_decoder is not None and input_encoder is None:
            input_encoder = input_decoder
        MPhi = jnp.asarray(output_encoder) if output_decoder is not None else None
        Psi = jnp.asarray(input_decoder) if input_decoder is not None else None

        # resume: first gap in the contiguous chunk prefix (stale chunks
        # beyond the gap are deleted — they may not align with this run's
        # chunk grid and would corrupt the compress-time concatenation)
        start = prune_stale_chunks(chunk_dir)
        t0 = time.time()
        i = start
        while i < n_samples:
            b = min(chunk_size, n_samples - i)
            batch = sample_until_solved(
                self.observable,
                self.prior,
                chunk_keychain(self.settings["seed"], 0, i),
                b,
                control_distribution=self.control_distribution,
                chunk_size=b,
                verbose=self.settings["verbose"],
                reset_initial_guess=self.settings["reset_initial_guess"],
                coarse_warm_start=self.settings["coarse_warm_start"],
            )
            payload = {
                "m_data": np.asarray(batch.ms),
                "q_data": np.asarray(batch.qs),
            }
            if has_z:
                payload["z_data"] = np.asarray(batch.zs)

            if derivatives[0]:
                J = materialize_jacobians(
                    self.observable, batch.ms, batch.us, batch.zs, chunk_size=b
                )
                self._derivative_payload(
                    payload, J, MPhi, Psi, self.settings["rM"], prefix=""
                )
            if derivatives[1]:
                assert has_z, "control Jacobian requires a control distribution"
                Jz = materialize_jacobians(
                    self.observable,
                    batch.ms,
                    batch.us,
                    batch.zs,
                    chunk_size=b,
                    control=True,
                )
                self._derivative_payload(
                    payload, Jz, MPhi, None, self.settings["rZ"], prefix="z"
                )

            np.savez(os.path.join(chunk_dir, f"chunk_{i}_{i + b}.npz"), **payload)
            if self.settings["save_failed_solves"] and batch.failed_ms is not None:
                # archive nonconverged parameters (reference skipped/
                # directory, `dataGenerator.py:232-241`)
                skipped_dir = os.path.join(data_dir, "skipped")
                os.makedirs(skipped_dir, exist_ok=True)
                np.save(
                    os.path.join(skipped_dir, f"m_failed_{i}_{i + b}.npy"),
                    batch.failed_ms,
                )
            if self.settings["verbose"]:
                rate = (i + b - start) / (time.time() - t0)
                print(f"samples [{i}, {i + b}) done ({rate:.2f} samples/s)")
            i += b

        if compress:
            self.compress_dataset(
                data_dir,
                derivatives=derivatives,
                clean_up=clean_up,
                has_z_data=has_z,
                input_decoder=input_decoder,
                input_encoder=input_encoder,
                output_decoder=output_decoder,
                output_encoder=output_encoder,
            )

    # ------------------------------------------------------------------
    def two_step_generate(
        self,
        n_samples: int,
        n_samples_pod: int | None = None,
        derivatives=(0, 0),
        pod_rank: int | None = None,
        data_dir: str = "data/test/",
        compress: bool = True,
        clean_up: bool = True,
        pod_method: str = "hep",
        pod_shifted: bool = True,
    ):
        """'Texas two-step' (reference `dataGenerator.py:251-297`):
        1. forward samples of the full state, 2. POD from the state data,
        3. Jacobian data only in the POD output subspace."""
        assert isinstance(self.observable.B, StateSpaceIdentityOperator), (
            "two_step_generate assumes a full-state observable"
        )
        n_samples_pod = n_samples_pod or n_samples
        assert pod_rank is not None and pod_rank <= n_samples_pod

        self.generate(
            n_samples, derivatives=(0, 0), data_dir=data_dir, compress=True,
            clean_up=False,
        )
        fname = "mzq_data.npz" if self.control_distribution is not None else "mq_data.npz"
        all_data = np.load(os.path.join(data_dir, fname))
        u_data = all_data["q_data"][:n_samples_pod]
        POD = PODProjectorFromData([self.observable.problem.Vu])
        d_POD, phi, Mphi, u_shift = POD.construct_subspace(
            u_data, pod_rank, shifted=pod_shifted, method=pod_method, verify=True
        )
        u_rank_verify = pod_rank - 1 if pod_shifted else pod_rank
        PsistarPsi = Mphi[:, :u_rank_verify].T @ phi[:, :u_rank_verify]
        orth_error = float(
            jnp.linalg.norm(PsistarPsi - jnp.eye(u_rank_verify))
        )
        if self.settings["verbose"]:
            print("||Psi^*Psi - I|| =", orth_error)
        assert orth_error < 1e-5
        pod_dir = os.path.join(data_dir, "POD")
        os.makedirs(pod_dir, exist_ok=True)
        np.save(os.path.join(pod_dir, "POD_decoder.npy"), np.asarray(phi))
        np.save(os.path.join(pod_dir, "POD_encoder.npy"), np.asarray(Mphi))
        np.save(os.path.join(pod_dir, "d_POD.npy"), np.asarray(d_POD))
        np.save(os.path.join(pod_dir, "POD_shift.npy"), np.asarray(u_shift))

        self.compute_jacobians_in_subspace(
            derivatives=derivatives,
            output_decoder=phi,
            output_encoder=Mphi,
            data_file_name=fname,
            data_dir=data_dir,
            compress=compress,
            clean_up=clean_up,
        )

    # ------------------------------------------------------------------
    def compute_jacobians_in_subspace(
        self,
        derivatives,
        output_decoder,
        data_file_name: str,
        data_dir: str,
        output_encoder=None,
        compress: bool = True,
        clean_up: bool = True,
    ):
        """Jacobian sketches J^T MPhi at stored (m, u[, z]) linearization
        points (reference `dataGenerator.py:300-355`)."""
        if output_encoder is None:
            output_encoder = output_decoder
        MPhi = jnp.asarray(output_encoder)
        data = np.load(os.path.join(data_dir, data_file_name))
        m_data = jnp.asarray(data["m_data"])
        u_data = jnp.asarray(data["q_data"])  # full-state observable: q == u
        z_data = jnp.asarray(data["z_data"]) if "z_data" in data else None

        # from-scratch loop: clear any leftover chunks (an interrupted run
        # with a different chunk grid would otherwise leave stale files that
        # fail — or worse, pass — tiling validation at compress time)
        chunk_dir = os.path.join(data_dir, "chunks_J")
        import shutil

        shutil.rmtree(chunk_dir, ignore_errors=True)
        os.makedirs(chunk_dir, exist_ok=True)
        chunk_size = self.settings["chunk_size"] or auto_chunk_size(
            self.observable.problem.state_dim,
            m_data.dtype,
            problem=self.observable.problem,
        )
        N = m_data.shape[0]
        for s in range(0, N, chunk_size):
            e = min(s + chunk_size, N)
            zc = z_data[s:e] if z_data is not None else None
            payload = {}
            if derivatives[0]:
                J = materialize_jacobians(
                    self.observable, m_data[s:e], u_data[s:e], zc, chunk_size=e - s
                )
                payload["JstarPhi_data"] = np.asarray(
                    jnp.einsum("sqm,qk->smk", J, MPhi)
                )
            if derivatives[1]:
                Jz = materialize_jacobians(
                    self.observable, m_data[s:e], u_data[s:e], zc,
                    chunk_size=e - s, control=True,
                )
                payload["JzstarPhi_data"] = np.asarray(
                    jnp.einsum("sqm,qk->smk", Jz, MPhi)
                )
            np.savez(os.path.join(chunk_dir, f"chunk_{s}_{e}.npz"), **payload)

        if compress:
            self._compress_jacobian_chunks(
                data_dir, chunk_dir, derivatives, output_decoder, output_encoder,
                clean_up,
            )

    # ------------------------------------------------------------------
    def _derivative_payload(self, payload, J, MPhi, Psi, r, prefix: str):
        if MPhi is not None:
            payload[f"J{prefix}starPhi_data"] = np.asarray(
                jnp.einsum("sqm,qk->smk", J, MPhi)
            )
        elif Psi is not None and prefix == "":
            payload["JPsi_data"] = np.asarray(jnp.einsum("sqm,mk->sqk", J, Psi))
        else:
            r = min(
                r or min(J.shape[1], J.shape[2]), min(J.shape[1], J.shape[2])
            )
            U, sig, Vt = jnp.linalg.svd(J, full_matrices=False)
            payload[f"U{prefix}_data"] = np.asarray(U[:, :, :r])
            payload[f"sigma{prefix}_data"] = np.asarray(sig[:, :r])
            payload[f"V{prefix}_data"] = np.asarray(
                jnp.swapaxes(Vt, 1, 2)[:, :, :r]
            )

    @staticmethod
    def _scan_chunks(chunk_dir):
        out = []
        for f in glob.glob(os.path.join(chunk_dir, "chunk_*_*.npz")):
            m = re.match(r".*chunk_(\d+)_(\d+)\.npz", f)
            if m:
                out.append((int(m.group(1)), int(m.group(2)), f))
        return sorted(out)

    # ------------------------------------------------------------------
    def compress_dataset(
        self,
        data_dir,
        derivatives=(0, 0),
        clean_up: bool = True,
        has_z_data: bool = False,
        input_decoder=None,
        input_encoder=None,
        output_decoder=None,
        output_encoder=None,
    ):
        """Concatenate chunk files into the reference's consolidated npz
        bundles (`dataGenerator.py:495-667`)."""
        chunk_dir = os.path.join(data_dir, "chunks")
        cat = load_chunks_validated(chunk_dir)

        mq_name = "mzq_data.npz" if has_z_data else "mq_data.npz"
        mq = {k: cat[k] for k in ("m_data", "q_data", "z_data") if k in cat}
        np.savez_compressed(os.path.join(data_dir, mq_name), **mq)

        if derivatives[0]:
            if "JstarPhi_data" in cat:
                np.savez_compressed(
                    os.path.join(data_dir, "JstarPhi_data.npz"),
                    JstarPhi_data=cat["JstarPhi_data"],
                    Phi=np.asarray(output_decoder),
                    MPhi=np.asarray(output_encoder),
                )
            if "JPsi_data" in cat:
                np.savez_compressed(
                    os.path.join(data_dir, "JPsi_data.npz"),
                    JPsi_data=cat["JPsi_data"],
                    Psi=np.asarray(input_decoder),
                    input_encoder=np.asarray(input_encoder),
                )
            if "U_data" in cat:
                np.savez_compressed(
                    os.path.join(data_dir, "Jsvd_data.npz"),
                    U_data=cat["U_data"],
                    sigma_data=cat["sigma_data"],
                    V_data=cat["V_data"],
                )
        if derivatives[1]:
            if "JzstarPhi_data" in cat:
                np.savez_compressed(
                    os.path.join(data_dir, "JzstarPhi_data.npz"),
                    JzstarPhi_data=cat["JzstarPhi_data"],
                    Phi=np.asarray(output_decoder),
                    MPhi=np.asarray(output_encoder),
                )
            if "Uz_data" in cat:
                np.savez_compressed(
                    os.path.join(data_dir, "Jzsvd_data.npz"),
                    Uz_data=cat["Uz_data"],
                    sigmaz_data=cat["sigmaz_data"],
                    Vz_data=cat["Vz_data"],
                )
        if clean_up:
            shutil.rmtree(chunk_dir, ignore_errors=True)

    def _compress_jacobian_chunks(
        self, data_dir, chunk_dir, derivatives, output_decoder, output_encoder,
        clean_up,
    ):
        cat = load_chunks_validated(chunk_dir)
        if derivatives[0]:
            np.savez_compressed(
                os.path.join(data_dir, "JstarPhi_data.npz"),
                JstarPhi_data=cat["JstarPhi_data"],
                Phi=np.asarray(output_decoder),
                MPhi=np.asarray(output_encoder),
            )
        if derivatives[1]:
            np.savez_compressed(
                os.path.join(data_dir, "JzstarPhi_data.npz"),
                JzstarPhi_data=cat["JzstarPhi_data"],
                Phi=np.asarray(output_decoder),
                MPhi=np.asarray(output_encoder),
            )
        if clean_up:
            shutil.rmtree(chunk_dir, ignore_errors=True)
