"""Rayleigh block fading channel model (reference:
src/sionna/phy/channel/rayleigh_block_fading.py:10)."""

import jax
import jax.numpy as jnp

from ..config import config
from .channel_model import ChannelModel


class RayleighBlockFading(ChannelModel):
    """i.i.d. Rayleigh fading, single zero-delay path, constant over
    time steps within a block."""

    def __init__(self, num_rx, num_rx_ant, num_tx, num_tx_ant,
                 precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        self.num_rx = int(num_rx)
        self.num_rx_ant = int(num_rx_ant)
        self.num_tx = int(num_tx)
        self.num_tx_ant = int(num_tx_ant)

    def __call__(self, batch_size, num_time_steps,
                 sampling_frequency=None, key=None):
        if key is None:
            key = config.next_key()
        kr, ki = jax.random.split(key)
        shape = (batch_size, self.num_rx, self.num_rx_ant, self.num_tx,
                 self.num_tx_ant, 1, 1)
        std = jnp.asarray(jnp.sqrt(0.5), self.rdtype)
        h = (std * jax.random.normal(kr, shape, self.rdtype)
             + 1j * std * jax.random.normal(ki, shape, self.rdtype)
             ).astype(self.cdtype)
        # constant over time steps
        a = jnp.tile(h, (1, 1, 1, 1, 1, 1, num_time_steps))
        tau = jnp.zeros((batch_size, self.num_rx, self.num_tx, 1),
                        self.rdtype)
        return a, tau
