"""OFDM modulator (reference: src/sionna/phy/ofdm/modulator.py:14).

IFFT + cyclic prefix; supports scalar or per-symbol CP lengths.
"""

import numpy as np

import jax.numpy as jnp

from ..block import Block
from ..signal.utils import ifft
from ..utils.tensors import flatten_last_dims

__all__ = ["OFDMModulator"]


class OFDMModulator(Block):
    """Computes the time-domain OFDM signal with cyclic prefix.

    Input [..., num_ofdm_symbols, fft_size] -> time signal
    [..., num_ofdm_symbols*(fft_size+cp)] (or with per-symbol CPs,
    [..., num_ofdm_symbols*fft_size + sum(cp)]).
    """

    def __init__(self, cyclic_prefix_length=0, precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        self.cyclic_prefix_length = cyclic_prefix_length

    @property
    def cyclic_prefix_length(self):
        return self._cyclic_prefix_length

    @cyclic_prefix_length.setter
    def cyclic_prefix_length(self, value):
        value = np.asarray(value, int)
        if not np.all(value >= 0):
            raise ValueError("`cyclic_prefix_length` must be nonnegative.")
        if value.ndim > 1:
            raise ValueError(
                "`cyclic_prefix_length` must be of rank 0 or 1")
        self._cyclic_prefix_length = value

    def call(self, inputs):
        x = jnp.asarray(inputs, self.cdtype)
        num_ofdm_symbols, fft_size = x.shape[-2:]
        cp = self._cyclic_prefix_length
        if not np.all(cp <= fft_size):
            raise ValueError(
                "`cyclic_prefix_length` cannot be larger than `fft_size`.")

        # Shift DC subcarrier to first position, IFFT
        x_freq = jnp.fft.ifftshift(x, axes=-1)
        x_time = ifft(x_freq, precision=self.precision)

        if cp.ndim == 1:
            if cp.shape[0] != num_ofdm_symbols:
                raise ValueError("`cyclic_prefix_length` must be of "
                                 "size [num_ofdm_symbols]")
            # per-symbol CP: gather from flattened symbols
            ind = []
            for s in range(num_ofdm_symbols):
                base = s * fft_size
                ind.append(base + np.arange(fft_size - cp[s], fft_size))
                ind.append(base + np.arange(fft_size))
            ind = jnp.asarray(np.concatenate(ind), jnp.int32)
            flat = flatten_last_dims(x_time, 2)
            return jnp.take(flat, ind, axis=-1)
        # uniform CP
        cpl = int(cp)
        cp_part = x_time[..., fft_size - cpl:]
        x_time = jnp.concatenate([cp_part, x_time], axis=-1)
        return flatten_last_dims(x_time, 2)
