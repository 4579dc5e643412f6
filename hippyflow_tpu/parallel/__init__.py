from .collective import (
    NullCollective,
    DeviceCollective,
    CollectiveOperator,
    MatrixMultCollectiveOperator,
    make_sample_fem_mesh,
    check_consistent_sharding,
    initialize_distributed,
)
