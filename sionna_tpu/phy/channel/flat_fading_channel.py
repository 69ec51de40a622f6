"""Flat-fading channel blocks (reference:
src/sionna/phy/channel/flat_fading_channel.py:11,74,133)."""

import jax
import jax.numpy as jnp

from ..block import Block
from ..config import config
from .awgn import AWGN

__all__ = ["GenerateFlatFadingChannel", "ApplyFlatFadingChannel",
           "FlatFadingChannel"]


class GenerateFlatFadingChannel(Block):
    """Generates i.i.d. flat-fading channel matrices
    [batch, num_rx_ant, num_tx_ant], with optional spatial
    correlation."""

    def __init__(self, num_tx_ant, num_rx_ant, spatial_corr=None,
                 precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        self._num_tx_ant = int(num_tx_ant)
        self._num_rx_ant = int(num_rx_ant)
        self.spatial_corr = spatial_corr

    @property
    def spatial_corr(self):
        return self._spatial_corr

    @spatial_corr.setter
    def spatial_corr(self, value):
        self._spatial_corr = value

    def call(self, batch_size, key=None):
        if key is None:
            key = config.next_key()
        kr, ki = jax.random.split(key)
        shape = (batch_size, self._num_rx_ant, self._num_tx_ant)
        std = jnp.asarray(jnp.sqrt(0.5), self.rdtype)
        h = (std * jax.random.normal(kr, shape, self.rdtype)
             + 1j * std * jax.random.normal(ki, shape, self.rdtype)
             ).astype(self.cdtype)
        if self._spatial_corr is not None:
            h = self._spatial_corr(h)
        return h


class ApplyFlatFadingChannel(Block):
    """y = h x (+ noise) (reference flat_fading_channel.py:74)."""

    def __init__(self, precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        self._awgn = AWGN(precision=self.precision)

    def call(self, x, h, no=None, key=None):
        x = jnp.asarray(x, self.cdtype)
        h = jnp.asarray(h, self.cdtype)
        y = jnp.matmul(h, x[..., None])[..., 0]
        if no is not None:
            y = self._awgn(y, no, key=key)
        return y


class FlatFadingChannel(Block):
    """Generate + apply flat fading with optional AWGN and channel
    return (reference flat_fading_channel.py:133)."""

    def __init__(self, num_tx_ant, num_rx_ant, spatial_corr=None,
                 add_awgn=True, return_channel=False, precision=None,
                 **kwargs):
        super().__init__(precision=precision, **kwargs)
        self._gen = GenerateFlatFadingChannel(
            num_tx_ant, num_rx_ant, spatial_corr=spatial_corr,
            precision=precision)
        self._app = ApplyFlatFadingChannel(precision=precision)
        self._add_awgn = bool(add_awgn)
        self._return_channel = bool(return_channel)

    @property
    def spatial_corr(self):
        return self._gen.spatial_corr

    @spatial_corr.setter
    def spatial_corr(self, value):
        self._gen.spatial_corr = value

    @property
    def generate(self):
        return self._gen

    @property
    def apply(self):
        return self._app

    def call(self, x, no=None, key=None):
        x = jnp.asarray(x, self.cdtype)
        if key is None:
            key = config.next_key()
        k1, k2 = jax.random.split(key)
        h = self._gen(x.shape[0], key=k1)
        no_arg = no if self._add_awgn else None
        y = self._app(x, h, no_arg, key=k2)
        if self._return_channel:
            return y, h
        return y
