"""Gaussian Matern priors (hippylib BiLaplacianPrior / LaplacianPrior
equivalents — the external contract of `hippyflow/modeling/maternPrior.py`).

BiLaplacian prior
-----------------
With K = gamma * A_aniso + delta * M (+ optional Robin boundary mass), the
covariance and precision are

    C = K^{-1} M K^{-1},        R = C^{-1} = K M^{-1} K.

Sampling uses the exact square root  C^{1/2} = K^{-1} L_M  with  M = L_M L_M^T
(dense Cholesky of the mass matrix):  m = mean + K^{-1} (L_M xi), xi ~ N(0,I).
This reproduces hippylib's sqrt-mass sampling exactly in distribution.

Laplacian prior
---------------
R = gamma * A + delta * M directly;  C = R^{-1};  C^{1/2} = L_R^{-T}.

All operators are exposed as *block* callables ``(n, k) -> (n, k)`` backed by
cached dense Cholesky factorizations: on TPU each prior application inside
the randomized eigensolvers is a pair of batched triangular solves plus a
matmul, entirely MXU-resident.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np

from .. import config
from ..fem import FunctionSpace, mass_matrix, stiffness_matrix, boundary_mass_matrix
from ..ops.linalg import CholeskyFactor


def aniso_tensor_2d(theta0: float, theta1: float, alpha: float) -> np.ndarray:
    """Constant anisotropic diffusion tensor.

    Matches hippylib's compiled AnisTensor2D expression consumed by
    `hippyflow/modeling/maternPrior.py:24-27`:
        [t0 sin^2(a) + t1 cos^2(a)   (t0 - t1) sin(a) cos(a)]
        [(t0 - t1) sin(a) cos(a)     t0 cos^2(a) + t1 sin^2(a)]
    """
    sa, ca = math.sin(alpha), math.cos(alpha)
    return np.array(
        [
            [theta0 * sa * sa + theta1 * ca * ca, (theta0 - theta1) * sa * ca],
            [(theta0 - theta1) * sa * ca, theta0 * ca * ca + theta1 * sa * sa],
        ]
    )


class _GaussianPriorBase:
    """Shared machinery: mass matrix + factorizations + block operators."""

    Vh: FunctionSpace

    def _init_mass(self, dtype):
        self.M = mass_matrix(self.Vh, dtype=dtype)
        self._M_chol = CholeskyFactor(L=jnp.linalg.cholesky(self.M))

    # --- mass operators ---------------------------------------------------
    def M_matmat(self, X):
        return self.M @ X

    def Msolver_matmat(self, X):
        return self._M_chol.solve(X)

    def sqrtM_matmat(self, X):
        """L_M @ X with M = L_M L_M^T."""
        return self._M_chol.matvec_L(X)

    @property
    def dim(self) -> int:
        return self.Vh.dim

    @property
    def noise_dim(self) -> int:
        return self.Vh.dim


class BiLaplacianPrior(_GaussianPriorBase):
    """Matern-like Gaussian prior with BiLaplacian precision.

    Reference factory: BiLaplacian2D (`hippyflow/modeling/maternPrior.py:19`).
    """

    def __init__(
        self,
        Vh: FunctionSpace,
        gamma: float,
        delta: float,
        theta0: float = 2.0,
        theta1: float = 0.5,
        alpha: float = math.pi / 4.0,
        mean=None,
        robin_bc: bool = False,
        dtype=None,
    ):
        dtype = dtype or config.default_dtype()
        self.Vh = Vh
        self.gamma, self.delta = float(gamma), float(delta)
        self._init_mass(dtype)
        A = stiffness_matrix(Vh, aniso_tensor_2d(theta0, theta1, alpha), dtype=dtype)
        K = self.gamma * A + self.delta * self.M
        if robin_bc:
            # hippylib Robin correction beta = sqrt(gamma*delta)/1.42 reduces
            # boundary variance inflation.
            beta = math.sqrt(self.gamma * self.delta) / 1.42
            K = K + beta * boundary_mass_matrix(Vh, dtype=dtype)
        self.K = K
        # hippylib exposes the sqrt-precision operator as prior.A
        # (`KLEProjector.py:296`): keep the alias.
        self.A = K
        # On structured meshes K is block-tridiagonal: block-Thomas replaces
        # the dense Cholesky for all K-solves (sampling, Rsolver).
        if Vh.mesh.structured_shape is not None:
            from ..ops.structured import factorize_block_tridiag_dense

            self._K_chol = factorize_block_tridiag_dense(
                K, Vh.mesh.structured_shape[0] + 1
            )
        else:
            self._K_chol = CholeskyFactor(L=jnp.linalg.cholesky(K))
        if mean is None:
            mean = jnp.zeros(Vh.dim, dtype=dtype)
        self.mean = jnp.asarray(mean, dtype=dtype)

    # --- precision / covariance blocks -------------------------------------
    def R_matmat(self, X):
        """R @ X = K M^{-1} K X."""
        return self.K @ self._M_chol.solve(self.K @ X)

    def Rsolver_matmat(self, X):
        """R^{-1} @ X = K^{-1} M K^{-1} X (this is also C @ X)."""
        return self._K_chol.solve(self.M @ self._K_chol.solve(X))

    def C_matmat(self, X):
        return self.Rsolver_matmat(X)

    def Ksolver_matmat(self, X):
        return self._K_chol.solve(X)

    def sample(self, noise):
        """Map white noise (..., n) to prior samples: mean + K^{-1} L_M xi.

        noise may be (n,) or batched (N, n); returns matching shape.
        """
        noise = jnp.asarray(noise, dtype=self.mean.dtype)
        batched = noise.ndim == 2
        xi = noise.T if batched else noise[:, None]
        m = self._K_chol.solve(self.sqrtM_matmat(xi))
        m = m.T if batched else m[:, 0]
        return self.mean + m

    def sample_n(self, key, n: int):
        import jax

        noise = jax.random.normal(key, (n, self.noise_dim), dtype=self.mean.dtype)
        return self.sample(noise)


class LaplacianPrior(_GaussianPriorBase):
    """Gaussian prior with Laplacian precision R = gamma A + delta M.

    Reference factory: Laplacian2D (`hippyflow/modeling/maternPrior.py:32`).
    Note: the anisotropy arguments are accepted for API parity but — exactly
    like the reference, which drops `anis_diff` when calling
    hp.LaplacianPrior — the stiffness is isotropic.
    """

    def __init__(
        self,
        Vh: FunctionSpace,
        gamma: float,
        delta: float,
        mean=None,
        dtype=None,
    ):
        dtype = dtype or config.default_dtype()
        self.Vh = Vh
        self.gamma, self.delta = float(gamma), float(delta)
        self._init_mass(dtype)
        A = stiffness_matrix(Vh, None, dtype=dtype)
        self.R = self.gamma * A + self.delta * self.M
        self.A = self.R
        self._R_chol = CholeskyFactor(L=jnp.linalg.cholesky(self.R))
        if mean is None:
            mean = jnp.zeros(Vh.dim, dtype=dtype)
        self.mean = jnp.asarray(mean, dtype=dtype)

    def R_matmat(self, X):
        return self.R @ X

    def Rsolver_matmat(self, X):
        return self._R_chol.solve(X)

    def C_matmat(self, X):
        return self.Rsolver_matmat(X)

    def sample(self, noise):
        """m = mean + L_R^{-T} xi so that Cov = R^{-1}."""
        noise = jnp.asarray(noise, dtype=self.mean.dtype)
        batched = noise.ndim == 2
        xi = noise.T if batched else noise[:, None]
        m = jsl.solve_triangular(self._R_chol.L, xi, lower=True, trans=1)
        m = m.T if batched else m[:, 0]
        return self.mean + m

    def sample_n(self, key, n: int):
        import jax

        noise = jax.random.normal(key, (n, self.noise_dim), dtype=self.mean.dtype)
        return self.sample(noise)


class StructuredBiLaplacianPrior:
    """BiLaplacianPrior on large structured meshes with O(n s) memory.

    Same covariance/precision and the same sampling distribution as
    `BiLaplacianPrior` — block Cholesky of a banded SPD matrix equals the
    dense Cholesky factor (Cholesky preserves the band), so samples match the
    dense prior bit-for-bit given the same noise — but every operator is
    stored in (nb, s, 3s) band form: M/K matvecs are O(n s), solves run
    through block cyclic reduction, and no n^2 array is ever formed.  This
    unlocks the reference's nx=192 configuration (37k dofs: dense prior
    operators would need 4 x 5.5 GB) and beyond.
    """

    def __init__(
        self,
        Vh: FunctionSpace,
        gamma: float,
        delta: float,
        theta0: float = 2.0,
        theta1: float = 0.5,
        alpha: float = math.pi / 4.0,
        mean=None,
        robin_bc: bool = False,
        dtype=None,
        materialize: bool = True,
        mesh=None,
        fem_axis: str = "fem",
    ):
        """materialize=True precomputes device bands and factorizations once
        (fast eager use). materialize=False stores only O(nc) element data
        and (re)assembles + factorizes *inside each trace*: jitted programs
        then carry only small constants — required where the lowered HLO
        must stay small (remote-compile transports cap the payload, and jax
        inlines closure-captured arrays as HLO literals).

        mesh: a `jax.sharding.Mesh` with a ``fem_axis`` axis enables
        dof-axis (domain-decomposition) parallelism: every operator shards
        its block rows over that axis — matvecs via halo-exchange shard_map,
        solves via the partitioned-SPIKE factorization
        (`parallel/dist_banded.py`), the TPU analog of the reference's
        dolfin-distributed vectors over `mesh_constructor_comm`
        (`comm_utils.py:19-40`)."""
        from ..fem.assembly import (
            boundary_mass_matrix_banded,
            mass_matrix_banded,
            stiffness_matrix_banded,
        )
        from ..ops.structured import block_tridiag_matmat

        assert Vh.mesh.structured_shape is not None and Vh.degree == 1
        dtype = dtype or config.default_dtype()
        self.Vh = Vh
        self.gamma, self.delta = float(gamma), float(delta)
        self._mesh, self._fem_axis = mesh, fem_axis
        if mesh is not None:
            assert fem_axis in mesh.axis_names

        M_band = mass_matrix_banded(Vh, dtype=dtype)
        A_band = stiffness_matrix_banded(
            Vh, aniso_tensor_2d(theta0, theta1, alpha), dtype=dtype
        )
        K_band = self.gamma * A_band + self.delta * M_band
        if robin_bc:
            beta = math.sqrt(self.gamma * self.delta) / 1.42
            K_band = K_band + beta * boundary_mass_matrix_banded(Vh, dtype=dtype)
        self.A = None  # no dense operator; use the matmat interface
        if mesh is None:
            self._mv = block_tridiag_matmat
        else:
            from ..parallel.dist_banded import dist_block_tridiag_matmat

            self._mv = lambda band, X: dist_block_tridiag_matmat(
                mesh, band, X, axis=fem_axis
            )
        self._materialize = bool(materialize)
        if self._materialize:
            self.M_band = jnp.asarray(M_band)
            self.K_band = jnp.asarray(K_band)
            self._cached_ops = self._build_ops(self.M_band, self.K_band)
        else:
            # Store only O(nc) *element* data; bands are scattered in-trace
            # with segment_sum so jitted programs carry a few MB of
            # constants instead of the O(n s) bands (which jax would inline
            # into the HLO as literals).
            geo = Vh.geometry
            local_m = (np.full((3, 3), 1.0) + np.eye(3)) / 12.0
            M_e = geo.volumes[:, None, None] * local_m[None]
            tensor = aniso_tensor_2d(theta0, theta1, alpha)
            A_e = np.einsum(
                "cid,de,cje,c->cij", geo.grads, tensor, geo.grads, geo.volumes
            )
            K_e = self.gamma * A_e + self.delta * M_e
            if robin_bc:
                from ..fem.mesh import boundary_edges

                beta = math.sqrt(self.gamma * self.delta) / 1.42
                edges = boundary_edges(Vh.mesh)
                x = Vh.mesh.vertices[edges]
                lens = np.sqrt(((x[:, 1] - x[:, 0]) ** 2).sum(-1))
                local_b = np.array([[2.0, 1.0], [1.0, 2.0]]) / 6.0
                self._Kb_e = np.asarray(
                    beta * lens[:, None, None] * local_b[None],
                    dtype=np.dtype(dtype),
                )
                self._edge_idx = self._band_idx(edges).astype(np.int32)
            else:
                self._Kb_e, self._edge_idx = None, None
            self._M_e = np.asarray(M_e, dtype=np.dtype(dtype))
            self._K_e = np.asarray(K_e, dtype=np.dtype(dtype))
            self._cell_idx = self._band_idx(Vh.mesh.cells).astype(np.int32)
            self._dtype = dtype
            self._cached_ops = None
            if mesh is not None:
                # static partition plans for the dof-sharded in-trace
                # assembly (parallel/dist_banded.dist_assemble_band)
                from ..parallel.dist_banded import partition_cells_by_row

                s_blk = Vh.mesh.structured_shape[0] + 1
                nb = Vh.dim // s_blk
                n_parts = mesh.shape[fem_axis]
                cells = np.asarray(Vh.mesh.cells)
                self._cell_plan, _ = partition_cells_by_row(
                    (cells // s_blk).min(axis=1), nb, n_parts
                )
                if self._Kb_e is not None:
                    from ..fem.mesh import boundary_edges

                    edges = np.asarray(boundary_edges(Vh.mesh))
                    self._edge_plan, _ = partition_cells_by_row(
                        (edges // s_blk).min(axis=1), nb, n_parts
                    )
                else:
                    self._edge_plan = None

        if mean is None:
            mean = jnp.zeros(Vh.dim, dtype=dtype)
        self.mean = jnp.asarray(mean, dtype=dtype)

    def _build_ops(self, M_band, K_band):
        from ..ops.structured import (
            block_cholesky_tridiag,
            factorize_block_cyclic_banded,
        )

        M_chol = block_cholesky_tridiag(M_band)
        if self._mesh is None:
            K_fac = factorize_block_cyclic_banded(K_band, with_transpose=False)
            M_fac = factorize_block_cyclic_banded(M_band, with_transpose=False)
            return (K_fac, M_fac, M_chol, M_band, K_band)

        # dof-sharded path: SPIKE factors with partition axis on 'fem';
        # sqrt-mass matvec L@x is itself a banded matvec (band [Off, C, 0]),
        # so it reuses the halo-exchange shard_map kernel.
        from ..parallel.dist_banded import (
            factorize_distributed_banded,
            place_on_mesh,
        )

        mesh, axis = self._mesh, self._fem_axis
        n_parts = mesh.shape[axis]
        n_true = self.Vh.dim
        K_fac = place_on_mesh(
            factorize_distributed_banded(
                K_band, n_parts, with_transpose=False, n_true=n_true
            ),
            mesh,
            axis,
        )
        M_fac = place_on_mesh(
            factorize_distributed_banded(
                M_band, n_parts, with_transpose=False, n_true=n_true
            ),
            mesh,
            axis,
        )
        band_L = jnp.concatenate(
            [M_chol.Off, jnp.tril(M_chol.C), jnp.zeros_like(M_chol.C)], axis=2
        )
        mv = self._mv

        class _DistChol:
            def matvec_L(self, X, _band=band_L, _mv=mv):
                return _mv(_band, X)

        return (K_fac, M_fac, _DistChol(), M_band, K_band)

    def _band_idx(self, conn):
        """Band scatter indices for a connectivity array (numpy)."""
        conn = np.asarray(conn)
        s = self.Vh.mesh.structured_shape[0] + 1
        a = conn.shape[1]
        g1 = np.repeat(conn, a, axis=1).reshape(-1).astype(np.int64)
        g2 = np.tile(conn, (1, a)).reshape(-1).astype(np.int64)
        o = g2 // s - g1 // s + 1
        return g1 * (3 * s) + o * s + (g2 % s)

    def _ops(self):
        if self._cached_ops is not None:
            return self._cached_ops
        import jax

        s = self.Vh.mesh.structured_shape[0] + 1
        n = self.Vh.dim

        if self._mesh is not None:
            # dof-sharded in-trace assembly: per-shard segment_sum + one
            # halo-row hop; the global band is never materialized on one
            # device (large-mesh scaling path)
            from ..parallel.dist_banded import dist_assemble_band

            nb = n // s

            def dist_scatter(vals_e, idx, plan):
                return dist_assemble_band(
                    self._mesh,
                    jnp.asarray(vals_e, self._dtype).reshape(
                        vals_e.shape[0], -1
                    ),
                    jnp.asarray(idx).reshape(vals_e.shape[0], -1),
                    plan,
                    nb,
                    s,
                    axis=self._fem_axis,
                )

            M_band = dist_scatter(self._M_e, self._cell_idx, self._cell_plan)
            K_band = dist_scatter(self._K_e, self._cell_idx, self._cell_plan)
            if self._Kb_e is not None:
                # boundary-edge contributions: zero the pad-row identity the
                # helper adds before summing bands (only one identity stays)
                Kb = dist_scatter(self._Kb_e, self._edge_idx, self._edge_plan)
                pad_rows = Kb.shape[0] - nb
                if pad_rows:
                    eye_pad = jnp.zeros_like(Kb)
                    eye_pad = eye_pad.at[nb:, :, s : 2 * s].set(
                        jnp.eye(s, dtype=Kb.dtype)
                    )
                    Kb = Kb - eye_pad
                K_band = K_band + Kb
                # remove the doubled pad identity from summing M-free K
                # contributions (K already carries one from its own scatter)
            return self._build_ops(M_band, K_band)

        def scatter(vals_e, idx):
            flat = jax.ops.segment_sum(
                jnp.asarray(vals_e, self._dtype).reshape(-1),
                jnp.asarray(idx),
                num_segments=n * 3 * s,
            )
            return flat.reshape(n // s, s, 3 * s)

        M_band = scatter(self._M_e, self._cell_idx)
        K_band = scatter(self._K_e, self._cell_idx)
        if self._Kb_e is not None:
            K_band = K_band + scatter(self._Kb_e, self._edge_idx)
        return self._build_ops(M_band, K_band)

    @property
    def dim(self) -> int:
        return self.Vh.dim

    @property
    def noise_dim(self) -> int:
        return self.Vh.dim

    # --- operator surface (same contract as BiLaplacianPrior) --------------
    def M_matmat(self, X):
        return self._mv(self._ops()[3], X)

    def Msolver_matmat(self, X):
        return self._ops()[1].solve(X)

    def sqrtM_matmat(self, X):
        return self._ops()[2].matvec_L(X)

    def K_matmat(self, X):
        return self._mv(self._ops()[4], X)

    def Ksolver_matmat(self, X):
        return self._ops()[0].solve(X)

    def R_matmat(self, X):
        return self.K_matmat(self.Msolver_matmat(self.K_matmat(X)))

    def Rsolver_matmat(self, X):
        return self.Ksolver_matmat(self.M_matmat(self.Ksolver_matmat(X)))

    def C_matmat(self, X):
        return self.Rsolver_matmat(X)

    def sample(self, noise):
        noise = jnp.asarray(noise, dtype=self.mean.dtype)
        batched = noise.ndim == 2
        xi = noise.T if batched else noise[:, None]
        m = self.Ksolver_matmat(self.sqrtM_matmat(xi))
        m = m.T if batched else m[:, 0]
        return self.mean + m

    def sample_n(self, key, n: int):
        import jax

        noise = jax.random.normal(key, (n, self.noise_dim), dtype=self.mean.dtype)
        return self.sample(noise)


def BiLaplacian2D(
    Vh,
    gamma: float = 0.1,
    delta: float = 0.1,
    theta0: float = 2.0,
    theta1: float = 0.5,
    alpha: float = math.pi / 4.0,
    mean=None,
    robin_bc: bool = False,
):
    """Reference-parity factory (`maternPrior.py:19-29`)."""
    return BiLaplacianPrior(
        Vh, gamma, delta, theta0, theta1, alpha, mean=mean, robin_bc=robin_bc
    )


def Laplacian2D(
    Vh,
    gamma: float = 0.1,
    delta: float = 0.1,
    theta0: float = 2.0,
    theta1: float = 0.5,
    alpha: float = math.pi / 4.0,
    mean=None,
):
    """Reference-parity factory (`maternPrior.py:32-41`)."""
    del theta0, theta1, alpha  # accepted but unused, as in the reference
    return LaplacianPrior(Vh, gamma, delta, mean=mean)
