"""hippyflow_tpu: TPU-native dimension-reduced surrogate construction for
PDE-governed parametric maps.

A from-scratch JAX/XLA re-design of the capabilities of hippylib/hippyflow
(reference layout in SURVEY.md): differentiable FEM assembly, Gaussian Matern
priors, matrix-free/materialized PDE Jacobians, randomized spectral methods
(active subspace, KLE, POD), derivative-informed training-data generation,
and DIPNet surrogates in flax — batched with vmap and sharded over
('sample', 'fem') device meshes instead of MPI.
"""

from . import config
from .version import __version__

from .fem import *  # noqa: F401,F403
from .ops import *  # noqa: F401,F403
from .models import *  # noqa: F401,F403
from .parallel import (
    NullCollective,
    DeviceCollective,
    make_sample_fem_mesh,
    check_consistent_sharding,
)
from .utils import ParameterList, KeyChain, mv_to_dense, dense_to_mv_local
