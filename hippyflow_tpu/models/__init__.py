"""Modeling layer: priors, PDE problems, observables, Jacobians, projectors."""

from .prior import (
    BiLaplacianPrior,
    StructuredBiLaplacianPrior,
    LaplacianPrior,
    BiLaplacian2D,
    Laplacian2D,
    aniso_tensor_2d,
)
from .pde_problem import (
    VariationalPDEProblem,
    Linearization,
    NewtonInfo,
    STATE,
    PARAMETER,
    ADJOINT,
    CONTROL,
)
from .observable import (
    LinearStateObservable,
    PointwiseObservation,
    StateSpaceIdentityOperator,
    DomainRestrictedOperator,
)
from .jacobian import (
    ObservableJacobian,
    ObservableControlJacobian,
    jtj_matmat,
    jjt_matmat,
)
from .sampling import (
    SampleBatch,
    sample_until_solved,
    materialize_jacobians,
    linearize_batch,
    UniformDistribution,
    auto_chunk_size,
)
from .active_subspace import ActiveSubspaceProjector, ActiveSubspaceParameterList
from .kle import (
    KLEProjector,
    KLEParameterList,
    KLESubspaceConstructor,
    MassPreconditionedCovarianceOperator,
    BoundaryRestrictedKLEProjector,
)
from .pod import (
    PODProjector,
    PODParameterList,
    PODProjectorFromData,
    weighted_l2_norm_vector,
)
from .data_generator import DataGenerator, data_generator_settings
from .model_wrapper import ModelWrapper, PointwiseMisfit, modelWrapperSettings
from .cminimization import ConstrainedNSolver, newtonSolver_ParameterList
from .multi_pde import BlockVector, MultiPDEProblem, MultiStateLinearObservable
