"""Dense/blocked linear algebra and randomized spectral methods."""

from .linalg import (
    CholeskyFactor,
    LUFactor,
    factorize,
    solve_refined,
    cg_solve,
    eigh_descending,
    generalized_eigh,
)
from .randomized import (
    orthogonalize,
    double_pass,
    double_pass_g,
    accuracy_enhanced_svd,
    lanczos_ghep,
)
from .structured import (
    BlockTridiagFactor,
    BlockCyclicFactor,
    extract_block_tridiag,
    factorize_block_tridiag,
    factorize_block_tridiag_dense,
    factorize_block_tridiag_banded,
    factorize_block_cyclic,
    factorize_block_cyclic_banded,
    InverseThomasFactor,
    factorize_thomas_inv_banded,
)
from .operators import (
    dense_operator,
    low_rank_operator,
    low_rank_rectangular_operator,
    prior_preconditioned_projector,
    mean_jtj_from_data_operator,
    solver_to_operator,
    transpose_operator,
    averaged_operator,
)
