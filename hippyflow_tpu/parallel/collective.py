"""Sample-parallel collectives over a jax device mesh.

The reference's distributed backend (`hippyflow/collectives/`) is MPI
allReduce/bcast over a 2D process grid (mesh-subdomains x sample-instances,
`comm_utils.py:19-40`).  The TPU-native mapping (SURVEY.md section 5.8):

* sample parallelism  -> arrays carrying a leading sample axis sharded over
  the 'sample' axis of a `jax.sharding.Mesh`; Monte-Carlo expectations
  reduce with `lax.pmean` inside `shard_map` (or, under jit, a plain
  `jnp.mean` for which XLA inserts the same all-reduce over ICI).
* bcast of the random probe Omega -> generating Omega from a replicated PRNG
  key (identical on every device); no communication at all.
* mesh/domain parallelism -> dof-axis sharding on a second mesh axis ('fem')
  (see `parallel/dist_banded.py`).
* multi-host -> `initialize_distributed()` (jax.distributed) before any
  backend use; the same mesh/axis code then spans all processes' devices
  and the shard_map collectives ride ICI within a slice and DCN across.

``NullCollective`` preserves the reference's serial test double
(`collectives/collective.py:19-38`).
"""

from __future__ import annotations

import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Multi-process (multi-host / multi-slice) runtime init.

    The analog of the reference's `MPI_Init`-provided world
    (`collectives/comm_utils.py`): after this, `jax.devices()` spans every
    process's chips and all mesh axes / collectives in this module work
    across hosts (DCN for the cross-slice hops).  Called explicitly or
    automatically when HIPPYFLOW_TPU_DISTRIBUTED=1 (cluster-autodetect
    environments: GKE/SLURM set the coordination env vars jax reads).

    Returns True when running multi-process after the call.
    """
    if (
        coordinator_address is not None
        or os.environ.get("HIPPYFLOW_TPU_DISTRIBUTED") == "1"
    ):
        try:
            # must run before anything initializes the XLA backend — do NOT
            # probe jax.process_count() first, that itself initializes it
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError as e:
            # already-initialized runtimes (repeat calls) are fine; jax's
            # message is "distributed.initialize should only be called once"
            msg = str(e).lower()
            if "already" not in msg and "once" not in msg:
                raise
    return jax.process_count() > 1


class NullCollective:
    """Serial no-op collective (reference parity)."""

    def size(self) -> int:
        return 1

    def rank(self) -> int:
        return 0

    def allReduce(self, v, op: str = "avg", replicated: bool | None = None):
        assert op in ("sum", "avg")
        return v

    def bcast(self, v, root: int = 0):
        return v

    def shard_samples(self, x):
        return x

    def sample_mean(self, x, axis: int = 0):
        return jnp.mean(x, axis=axis)


class DeviceCollective:
    """Collective backed by a device mesh axis.

    Unlike MPI there is no SPMD rank divergence: a "per-rank contribution"
    is an array whose leading axis is sharded over the mesh axis, and the
    reductions below are real XLA collectives (`lax.psum/pmean` inside
    `shard_map`), the literal analog of the reference's
    `MPI.Allreduce` (`collectives/collective.py:61-71`).  The same program
    runs single-process (virtual or real devices) and multi-process after
    `initialize_distributed()`.
    """

    def __init__(self, mesh: Mesh | None = None, axis: str = "sample"):
        if mesh is None:
            devs = np.array(jax.devices())
            mesh = Mesh(devs.reshape(len(devs)), ("sample",))
        self.mesh = mesh
        self.axis = axis
        assert axis in mesh.axis_names

    def size(self) -> int:
        return self.mesh.shape[self.axis]

    def rank(self) -> int:
        """Process index, NOT a per-device position along the mesh axis.

        Under single-controller SPMD there is no per-rank code divergence
        (all devices run one program), so the MPI notion of "my rank" maps
        to the host process: 0 in single-process runs, the jax process
        index under `initialize_distributed()`.  Use it the way the
        reference uses `comm.rank` — gating I/O and logging to one writer —
        not for splitting data (sharding does that)."""
        return jax.process_index()

    # --- real reductions ----------------------------------------------------
    def _divisible(self, x) -> bool:
        return jnp.ndim(x) >= 1 and x.shape[0] % self.size() == 0

    def psum_contributions(self, v, mean: bool = False):
        """Reduce per-device contributions: v has one leading-axis slice per
        position along the collective axis; returns the sum (or mean) over
        that axis computed with `lax.psum` inside `shard_map` — a real
        collective that survives multi-process execution."""
        v = jnp.asarray(v)
        n = self.size()
        assert v.shape[0] % n == 0, (
            f"leading axis {v.shape[0]} not divisible by collective size {n}"
        )
        spec = P(self.axis, *([None] * (v.ndim - 1)))
        rep = P(*([None] * (v.ndim - 1)))

        def red(x):  # x: (shape[0]/n, ...) local slice
            return jax.lax.psum(jnp.sum(x, axis=0), self.axis)

        out = jax.shard_map(
            red, mesh=self.mesh, in_specs=spec, out_specs=rep
        )(self.shard_samples(v))
        return out / v.shape[0] if mean else out

    def allReduce(self, v, op: str = "avg", replicated: bool | None = None):
        """MPI-allReduce analog (reference `collective.py:61-71`).

        * array with a leading contributions axis divisible by the
          collective size -> reduced over that axis with a shard_map psum;
        * scalar, or ``replicated=True`` -> every "rank" holds the same
          value by SPMD construction, so 'avg' is the identity and 'sum'
          scales by the collective size (the MPI result for replicated
          inputs);
        * non-divisible array without ``replicated=True`` -> ValueError.
          MPI's Allreduce has no silent mode and neither does this: a
          genuine per-contribution array that doesn't tile the collective
          cannot be reduced correctly, and guessing "replicated" here
          would return it unreduced."""
        assert op in ("sum", "avg")
        if replicated or jnp.ndim(v) == 0:
            return v * self.size() if op == "sum" else v
        if not self._divisible(v):
            raise ValueError(
                f"allReduce: leading axis {jnp.shape(v)[0]} is not divisible "
                f"by the collective size {self.size()}; pass replicated=True "
                "if every device holds the same (already-reduced) value"
            )
        return self.psum_contributions(v, mean=(op == "avg"))

    def bcast(self, v, root: int = 0):
        """Replicate v across the collective axis.  Under single-controller
        SPMD every value already originates replicated; this materializes
        that as an explicit fully-replicated sharding (the analog of
        `MPI.Bcast`, reference `collective.py:119-152`)."""
        v = jnp.asarray(v)
        return jax.device_put(v, NamedSharding(self.mesh, P()))

    def shard_samples(self, x):
        """Shard the leading (sample) axis of x across the mesh axis."""
        ndim = jnp.ndim(x)
        spec = P(self.axis, *([None] * (ndim - 1)))
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    def sample_mean(self, x, axis: int = 0):
        """Mean over the (sharded) sample axis.

        Outside a trace, on a divisibly-sharded axis-0 input, this runs the
        explicit shard_map pmean; inside jit (tracers) it lowers to
        `jnp.mean`, for which XLA inserts the identical all-reduce."""
        if axis == 0 and not isinstance(x, jax.core.Tracer) and self._divisible(x):
            return self.psum_contributions(x, mean=True)
        return jnp.mean(x, axis=axis)


class CollectiveOperator:
    """Operator whose every application is reduced across the collective —
    the sample-averaged operator fed to eigensolvers (reference
    `collectives/collectiveOperator.py:14-55`).

    The wrapped op either returns per-contribution results with a leading
    axis matching the collective size (reduced here with a real psum/pmean)
    or an already-reduced replicated array (sample-sharded inputs whose
    reduction XLA emitted inside the op) — declare the latter with
    ``replicated=True``, for which allReduce('avg') is the identity by
    construction."""

    def __init__(self, op, collective, mpi_op: str = "avg",
                 replicated: bool | None = None):
        self.op = op if callable(op) else op.matmat
        self.collective = collective
        self.mpi_op = mpi_op
        self.replicated = replicated

    def matmat(self, X):
        return self.collective.allReduce(
            self.op(X), self.mpi_op, replicated=self.replicated
        )

    mult = matmat  # reference naming
    __call__ = matmat


class MatrixMultCollectiveOperator(CollectiveOperator):
    """Block-interface twin of CollectiveOperator (reference
    `collectives/collectiveOperator.py:58-97`).  In this framework every
    operator is already a block matmat, so it is an alias kept for parity."""

    matMvMult = CollectiveOperator.matmat


def make_sample_fem_mesh(n_sample: int, n_fem: int = 1) -> Mesh:
    """2D ('sample', 'fem') device mesh — the analog of the reference's
    splitCommunicators process grid (`collectives/comm_utils.py:19-40`)."""
    devs = np.array(jax.devices()[: n_sample * n_fem])
    assert devs.size == n_sample * n_fem, "not enough devices"
    return Mesh(devs.reshape(n_sample, n_fem), ("sample", "fem"))


def make_multislice_mesh(n_fem: int = 1) -> Mesh:
    """('sample', 'fem') mesh spanning every slice/host, DCN-aware.

    Multi-slice topology mapping (SURVEY.md §5.8): the 'sample' axis — whose
    only collective is the cheap psum of Monte-Carlo expectations — is laid
    out to span slices (DCN hops), while the communication-heavy 'fem'
    (halo exchange + SPIKE interface gathers) stays inside a slice on ICI.
    Uses jax's hybrid mesh builder when slice boundaries are exposed;
    degenerates to `make_sample_fem_mesh` on a single slice."""
    devs = jax.devices()
    n_sample = len(devs) // n_fem
    assert n_sample * n_fem == len(devs), (
        f"{len(devs)} devices not divisible by n_fem={n_fem}"
    )
    num_slices = len({getattr(d, "slice_index", 0) for d in devs})
    if num_slices > 1:
        from jax.experimental import mesh_utils

        # granule 0 = within-slice (ICI), granule 1 = across slices (DCN):
        # fem must stay within a slice; sample absorbs the cross-slice axis.
        per_slice = len(devs) // num_slices
        assert per_slice % n_fem == 0, (
            f"n_fem={n_fem} must divide the per-slice device count "
            f"{per_slice} (the 'fem' axis cannot straddle a DCN boundary)"
        )
        dm = mesh_utils.create_hybrid_device_mesh(
            (per_slice // n_fem, n_fem),
            (num_slices, 1),
            devices=devs,
        )
        return Mesh(dm.reshape(n_sample, n_fem), ("sample", "fem"))
    return make_sample_fem_mesh(n_sample, n_fem)


def check_consistent_sharding(
    x, expected_axis: str = "sample", warn_unsharded: bool = True
) -> bool:
    """Partitioning assertion replacing the reference's
    checkMeshConsistentPartitioning (`comm_utils.py:62-75`).

    Returns False — the failure the reference's check raises on — when x is
    sharded over a *different* mesh axis than expected on its leading
    dimension (the wrong-partitioning bug class).  Unsharded/replicated
    inputs are consistent but defeat sample parallelism, so they pass with
    a warning."""
    sh = getattr(x, "sharding", None)
    if sh is None or not isinstance(sh, NamedSharding):
        if warn_unsharded:
            warnings.warn(
                f"array is not mesh-sharded (expected leading axis on "
                f"'{expected_axis}'); sample parallelism is inactive",
                stacklevel=2,
            )
        return True
    spec = sh.spec
    leading = spec[0] if len(spec) > 0 else None
    if leading is None:
        if warn_unsharded:
            warnings.warn(
                f"leading axis is replicated, not sharded on "
                f"'{expected_axis}'; sample parallelism is inactive",
                stacklevel=2,
            )
        return True
    if isinstance(leading, (tuple, list)):
        return expected_axis in leading
    return leading == expected_axis
