"""PUSCH codebook precoder (reference:
src/sionna/phy/nr/pusch_precoder.py:11; TS 38.211 Table 6.3.1.5)."""

import numpy as np

import jax.numpy as jnp

from ..block import Block

__all__ = ["PUSCHPrecoder"]


class PUSCHPrecoder(Block):
    """Precodes layer-mapped resource grids with per-transmitter
    codebook matrices.

    Input [batch, num_tx, num_layers, num_sym, num_sc] ->
    [batch, num_tx, num_antenna_ports, num_sym, num_sc].
    """

    def __init__(self, precoding_matrices, precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        shape = precoding_matrices[0].shape
        for w in precoding_matrices:
            if w.shape != shape:
                raise ValueError(
                    "All precoding matrices must have the same shape")
        self._w = np.stack(
            [np.asarray(w) for w in precoding_matrices]).astype(
            self.np_cdtype)

    def call(self, inputs):
        x = jnp.asarray(inputs, self.cdtype)
        if x.shape[1] != self._w.shape[0]:
            raise ValueError("Wrong number of transmitters")
        if x.shape[2] != self._w.shape[2]:
            raise ValueError("Wrong number of layers")
        # [b, tx, L, sym, sc] -> [b, sym, sc, tx, L, 1]
        xt = jnp.transpose(x, (0, 3, 4, 1, 2))[..., None]
        w = jnp.asarray(self._w)  # [tx, P, L]
        z = jnp.matmul(w, xt)[..., 0]  # [b, sym, sc, tx, P]
        return jnp.transpose(z, (0, 3, 4, 1, 2))
