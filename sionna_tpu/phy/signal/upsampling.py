"""Upsampling (reference: src/sionna/phy/signal/upsampling.py:11)."""

import jax.numpy as jnp

from ..block import Block


class Upsampling(Block):
    """Inserts ``samples_per_symbol - 1`` zeros between samples along
    ``axis``. Output length = N * samples_per_symbol."""

    def __init__(self, samples_per_symbol, axis=-1, precision=None,
                 **kwargs):
        super().__init__(precision=precision, **kwargs)
        self._samples_per_symbol = int(samples_per_symbol)
        self._axis = axis

    def call(self, x):
        x = jnp.asarray(x)
        axis = self._axis % x.ndim
        x = jnp.moveaxis(x, axis, -1)
        shape = x.shape
        zeros = jnp.zeros(shape + (self._samples_per_symbol - 1,),
                          x.dtype)
        up = jnp.concatenate([x[..., None], zeros], axis=-1)
        up = jnp.reshape(up, shape[:-1]
                         + (shape[-1] * self._samples_per_symbol,))
        return jnp.moveaxis(up, -1, axis)
