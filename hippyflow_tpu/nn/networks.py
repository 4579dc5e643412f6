"""Derivative-informed projected neural networks (DIPNet / DIPResNet).

Flax re-implementation of the reference's keras model zoo
(`applications/confusion/dipnet_paper/neuralNetworks.py`):

* ``projected_dense``  — DIPNet (`neuralNetworks.py:95-113`): first linear
  layer initialized to the reduced input decoder (AS/KLE basis) and FROZEN;
  trainable bias; softplus dense layers in reduced coordinates; last layer
  initialized to the POD/output decoder transpose, trainable.
* ``projected_low_rank_residual_network`` — DIPResNet
  (`neuralNetworks.py:43-90`): rank-r residual blocks
  z += Dense(dim(z)) (softplus(Dense(r)(z))) between the projections.
* ``generic_dense`` / ``generic_linear`` / ``low_rank_linear`` —
  unprojected baselines (`neuralNetworks.py:117-148`).

Freezing: the input projection is a fixed (non-trainable) constant captured
in the module, exactly matching keras ``trainable=False`` semantics; the
trainable bias that follows reproduces the reference's BiasLayer.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class _ProjectedBase(nn.Module):
    def _embed(self, m, input_projector):
        P = jnp.asarray(input_projector, dtype=m.dtype)
        z = m @ P  # frozen input projection
        bias = self.param("input_bias", nn.initializers.zeros, (P.shape[1],))
        return z + bias

    def _emit(self, z, output_projector, output_shift=None):
        """Trainable output layer initialized to the output decoder^T.

        ``output_shift`` (the training-data mean q_bar) initializes the
        output bias: hessianlearn's ``RegressionProblem(y_mean=q_mean)``
        (`confusion_training.py:177`) centers the regression the same way,
        and the POD basis itself is built from MEAN-SHIFTED snapshots
        (`PODProjector.py:698-706` shifted=True), so without the shift the
        network must waste capacity reconstructing the mean."""
        Phi = np.asarray(output_projector)
        kernel_init = lambda key, shape, dtype=jnp.float32: jnp.asarray(
            Phi.T, dtype=dtype
        )
        if output_shift is None:
            bias_init = nn.initializers.zeros
        else:
            shift = np.asarray(output_shift)
            bias_init = lambda key, shape, dtype=jnp.float32: jnp.asarray(
                shift, dtype=dtype
            )
        return nn.Dense(
            Phi.shape[0], kernel_init=kernel_init, bias_init=bias_init,
            name="output_layer",
        )(z)


class DIPNet(_ProjectedBase):
    """projected_dense: m -> softplus dense stack in reduced coordinates."""

    input_projector: np.ndarray  # (dM, rIn)
    output_projector: np.ndarray  # (dQ, rOut)
    intermediate_layers: int = 1
    output_shift: np.ndarray | None = None  # (dQ,) training-data mean

    @nn.compact
    def __call__(self, m):
        z = self._embed(m, self.input_projector)
        rIn = self.input_projector.shape[1]
        rOut = self.output_projector.shape[1]
        z = nn.softplus(nn.Dense(rIn, name="dense_reduction_layer")(z))
        for i in range(self.intermediate_layers):
            z = nn.softplus(nn.Dense(rOut, name=f"inner_layer_{i}")(z))
        return self._emit(z, self.output_projector, self.output_shift)


class DIPResNet(_ProjectedBase):
    """projected_low_rank_residual_network: low-rank residual blocks."""

    input_projector: np.ndarray
    output_projector: np.ndarray
    ranks: Sequence[int] = (4, 4)
    residual_activation: str = "softplus"  # helmholtz variant uses sigmoid
    output_shift: np.ndarray | None = None

    @nn.compact
    def __call__(self, m):
        z = self._embed(m, self.input_projector)
        act = getattr(nn, self.residual_activation)
        dim = z.shape[-1]
        for i, rank in enumerate(self.ranks):
            h = act(nn.Dense(rank, name=f"lr_{i}_in")(z))
            z = z + nn.Dense(dim, name=f"lr_{i}_out")(h)
        rOut = self.output_projector.shape[1]
        z = nn.Dense(rOut, name="reduced_output")(z)
        return self._emit(z, self.output_projector, self.output_shift)


class GenericDense(nn.Module):
    """generic_dense (`neuralNetworks.py:117-124`)."""

    output_dim: int

    @nn.compact
    def __call__(self, m):
        z = nn.softplus(nn.Dense(self.output_dim)(m))
        z = nn.softplus(nn.Dense(self.output_dim)(z))
        return nn.Dense(self.output_dim)(z)


class GenericLinear(nn.Module):
    output_dim: int

    @nn.compact
    def __call__(self, m):
        return nn.Dense(self.output_dim)(m)


class LowRankLinear(nn.Module):
    """low_rank_linear (`neuralNetworks.py:143-148`)."""

    output_dim: int
    rank: int = 16

    @nn.compact
    def __call__(self, m):
        z = nn.Dense(self.rank, use_bias=False, name="intermediate")(m)
        return nn.Dense(self.output_dim)(z)


def projected_dense(
    input_projector, output_projector, intermediate_layers=1, output_shift=None
):
    """Reference-parity factory returning a DIPNet module."""
    return DIPNet(
        input_projector=np.asarray(input_projector),
        output_projector=np.asarray(output_projector),
        intermediate_layers=intermediate_layers,
        output_shift=None if output_shift is None else np.asarray(output_shift),
    )


def projected_low_rank_residual_network(
    input_projector, output_projector, ranks=(4, 4),
    residual_activation="softplus", output_shift=None,
):
    return DIPResNet(
        input_projector=np.asarray(input_projector),
        output_projector=np.asarray(output_projector),
        ranks=tuple(ranks),
        residual_activation=residual_activation,
        output_shift=None if output_shift is None else np.asarray(output_shift),
    )
