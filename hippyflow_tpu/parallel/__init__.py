from .collective import (
    NullCollective,
    DeviceCollective,
    make_sample_fem_mesh,
    check_consistent_sharding,
)
