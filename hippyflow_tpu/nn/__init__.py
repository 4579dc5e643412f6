"""Surrogate (NN) layer: projected networks + derivative-informed training."""

from .networks import (
    DIPNet,
    DIPResNet,
    GenericDense,
    GenericLinear,
    LowRankLinear,
    projected_dense,
    projected_low_rank_residual_network,
)
from .training import (
    train,
    l2_loss,
    make_h1_loss,
    jstarphi_from_jsvd,
    accuracy,
    gauss_newton_cg_step,
)
