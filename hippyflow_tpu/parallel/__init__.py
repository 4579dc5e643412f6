from .collective import (
    NullCollective,
    DeviceCollective,
    CollectiveOperator,
    MatrixMultCollectiveOperator,
    make_sample_fem_mesh,
    make_multislice_mesh,
    check_consistent_sharding,
    initialize_distributed,
)
from .dist_banded import (
    DistributedBandedFactor,
    dist_block_tridiag_matmat,
    factorize_distributed_banded,
    place_on_mesh,
)
