"""Apply a discrete-time channel (reference:
src/sionna/phy/channel/apply_time_channel.py:14).

TPU design: the doubly-selective convolution is a banded Toeplitz
gather (static index matrix, one XLA gather) followed by a fused
multiply-reduce, exactly the memory-friendly structure the reference
builds with scipy.linalg.toeplitz.
"""

import numpy as np

import jax.numpy as jnp

from ..block import Block
from ..utils.tensors import insert_dims
from .awgn import AWGN


class ApplyTimeChannel(Block):
    """y_b = sum_l h_{b,l} x_{b-l} (+ noise).

    x: [batch, num_tx, num_tx_ant, num_time_samples]
    h_time: [batch, num_rx, num_rx_ant, num_tx, num_tx_ant,
             num_time_samples + l_tot - 1, l_tot]
    -> y: [batch, num_rx, num_rx_ant, num_time_samples + l_tot - 1]
    """

    def __init__(self, num_time_samples, l_tot, precision=None,
                 **kwargs):
        super().__init__(precision=precision, **kwargs)
        self._awgn = AWGN(precision=self.precision)
        num_time_samples = int(num_time_samples)
        l_tot = int(l_tot)
        # Toeplitz gather matrix G[out_t, l] = out_t - l, with
        # out-of-range indices pointing at a zero pad slot.
        out_t = np.arange(num_time_samples + l_tot - 1)[:, None]
        l = np.arange(l_tot)[None, :]
        g = out_t - l
        g = np.where((g < 0) | (g >= num_time_samples),
                     num_time_samples, g)
        self._g = g.astype(np.int32)

    def call(self, x, h_time, no=None, key=None):
        x = jnp.asarray(x, self.cdtype)
        h_time = jnp.asarray(h_time, self.cdtype)
        # pad zero slot at the end of time axis
        x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, 1)])
        x = insert_dims(x, 2, axis=1)  # [b, 1, 1, tx, txa, T+1]
        x = jnp.take(x, jnp.asarray(self._g), axis=-1)
        y = jnp.sum(h_time * x, axis=-1)
        y = jnp.sum(y, axis=(3, 4))
        if no is not None:
            y = self._awgn(y, no, key=key)
        return y
