"""OFDM channel: generate + apply (reference:
src/sionna/phy/channel/ofdm_channel.py:13)."""

import jax

from ..block import Block
from ..config import config
from .generate_ofdm_channel import GenerateOFDMChannel
from .apply_ofdm_channel import ApplyOFDMChannel


class OFDMChannel(Block):
    """Samples the channel, applies it in the frequency domain, and
    optionally adds noise / returns the channel."""

    def __init__(self, channel_model, resource_grid, add_awgn=True,
                 normalize_channel=False, return_channel=False,
                 precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        self._gen = GenerateOFDMChannel(channel_model, resource_grid,
                                        normalize_channel=normalize_channel,
                                        precision=precision)
        self._app = ApplyOFDMChannel(precision=precision)
        self._add_awgn = bool(add_awgn)
        self._return_channel = bool(return_channel)

    def call(self, x, no=None, key=None):
        if key is None:
            key = config.next_key()
        k1, k2 = jax.random.split(key)
        h_freq = self._gen(x.shape[0], key=k1)
        no_arg = no if self._add_awgn else None
        y = self._app(x, h_freq, no_arg, key=k2)
        if self._return_channel:
            return y, h_freq
        return y
