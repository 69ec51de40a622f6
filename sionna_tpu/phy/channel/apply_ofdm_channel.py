"""Apply a frequency-domain channel (reference:
src/sionna/phy/channel/apply_ofdm_channel.py:14)."""

import jax.numpy as jnp

from ..block import Block
from ..utils.tensors import expand_to_rank
from .awgn import AWGN


class ApplyOFDMChannel(Block):
    """y = sum_tx,txa h * x (+ noise).

    x: [batch, num_tx, num_tx_ant, num_ofdm_symbols, fft_size]
    h_freq: [batch, num_rx, num_rx_ant, num_tx, num_tx_ant,
             num_ofdm_symbols, fft_size]
    -> y: [batch, num_rx, num_rx_ant, num_ofdm_symbols, fft_size]
    """

    def __init__(self, precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        self._awgn = AWGN(precision=self.precision)

    def call(self, x, h_freq, no=None, key=None):
        x = jnp.asarray(x, self.cdtype)
        h_freq = jnp.asarray(h_freq, self.cdtype)
        x = expand_to_rank(x, h_freq.ndim, axis=1)
        y = jnp.sum(h_freq * x, axis=(3, 4))
        if no is not None:
            y = self._awgn(y, no, key=key)
        return y
