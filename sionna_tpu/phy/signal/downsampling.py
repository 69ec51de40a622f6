"""Downsampling (reference: src/sionna/phy/signal/downsampling.py:9)."""

import jax.numpy as jnp

from ..block import Block


class Downsampling(Block):
    """Keeps every ``samples_per_symbol``-th sample starting at
    ``offset`` along ``axis``, producing ``num_symbols`` outputs (or as
    many as fit)."""

    def __init__(self, samples_per_symbol, offset=0, num_symbols=None,
                 axis=-1, precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        self._samples_per_symbol = int(samples_per_symbol)
        self._offset = int(offset)
        self._num_symbols = num_symbols
        self._axis = axis

    def call(self, x):
        x = jnp.asarray(x)
        axis = self._axis % x.ndim
        x = jnp.moveaxis(x, axis, -1)
        out = x[..., self._offset::self._samples_per_symbol]
        if self._num_symbols is not None:
            out = out[..., :self._num_symbols]
        return jnp.moveaxis(out, -1, axis)
