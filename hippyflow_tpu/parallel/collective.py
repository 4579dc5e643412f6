"""Sample-parallel collectives over a jax device mesh.

The reference's distributed backend (`hippyflow/collectives/`) is MPI
allReduce/bcast over a 2D process grid (mesh-subdomains x sample-instances,
`comm_utils.py:19-40`).  The TPU-native mapping (SURVEY.md section 5.8):

* sample parallelism  -> arrays carrying a leading sample axis sharded over
  the 'sample' axis of a `jax.sharding.Mesh`; Monte-Carlo expectations are
  plain `jnp.mean` over that axis — XLA inserts the all-reduce over ICI.
* bcast of the random probe Omega -> generating Omega from a replicated PRNG
  key (identical on every device); no communication at all.
* mesh/domain parallelism -> dof-axis sharding on a second mesh axis ('fem').

``NullCollective`` preserves the reference's serial test double
(`collectives/collective.py:19-38`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class NullCollective:
    """Serial no-op collective (reference parity)."""

    def size(self) -> int:
        return 1

    def rank(self) -> int:
        return 0

    def allReduce(self, v, op: str = "avg"):
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

    Unlike MPI, there is no SPMD rank divergence: this object shards
    sample-batched arrays and relies on XLA collectives for reductions.
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
        # Single-controller SPMD: rank is only meaningful per-process.
        return jax.process_index()

    def allReduce(self, v, op: str = "avg"):
        # Arrays sharded by shard_samples reduce globally via jnp ops; host
        # scalars are already replicated. Kept for API parity.
        assert op in ("sum", "avg")
        return v

    def bcast(self, v, root: int = 0):
        return v

    def shard_samples(self, x):
        """Shard the leading (sample) axis of x across the mesh axis."""
        ndim = jnp.ndim(x)
        spec = P(self.axis, *([None] * (ndim - 1)))
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    def sample_mean(self, x, axis: int = 0):
        """Mean over the (sharded) sample axis: XLA emits the all-reduce."""
        return jnp.mean(x, axis=axis)


class CollectiveOperator:
    """Operator whose every application is reduced across the collective —
    the sample-averaged operator fed to eigensolvers (reference
    `collectives/collectiveOperator.py:14-55`).

    Wraps a *local* matmat/operator; with a DeviceCollective the wrapped
    matmat is expected to consume sample-sharded arrays, so the reduction is
    the jnp mean XLA already emits and `allReduce` is the identity — the
    class exists for structural parity and for custom collectives."""

    def __init__(self, op, collective, mpi_op: str = "avg"):
        self.op = op if callable(op) else op.matmat
        self.collective = collective
        self.mpi_op = mpi_op

    def matmat(self, X):
        return self.collective.allReduce(self.op(X), self.mpi_op)

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


def check_consistent_sharding(x, expected_axis: str = "sample") -> bool:
    """Sharding-spec assertion replacing the reference's
    checkMeshConsistentPartitioning (`comm_utils.py:62-75`)."""
    sh = getattr(x, "sharding", None)
    if sh is None or not isinstance(sh, NamedSharding):
        return True
    spec = sh.spec
    return len(spec) == 0 or spec[0] in (None, expected_axis)
