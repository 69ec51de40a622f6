"""OFDM MIMO equalization (reference:
src/sionna/phy/ofdm/equalization.py:17,277,346,405; fresh JAX
implementations)."""

import jax.numpy as jnp

from ..block import Block
from ..mimo import (lmmse_equalizer, zf_equalizer, mf_equalizer)
from .detection import OFDMDetector

__all__ = ["OFDMEqualizer", "LMMSEEqualizer", "ZFEqualizer",
           "MFEqualizer"]


class OFDMEqualizer(OFDMDetector):
    """Wraps a per-RE MIMO equalizer function for OFDM resource grids
    (reference equalization.py:17).

    Output: (x_hat [b, num_tx, num_streams, num_data_symbols],
    no_eff same shape).
    """

    def __init__(self, equalizer, resource_grid, stream_management,
                 precision=None, **kwargs):
        if not callable(equalizer):
            raise TypeError("equalizer must be callable.")

        def detector(y, h, s):
            x_hat, no_eff = equalizer(y, h, s,
                                      precision=self.precision)
            # stack on a trailing dim so the base class extraction
            # applies to both
            return jnp.stack(
                [x_hat, no_eff.astype(x_hat.dtype)], axis=-1)

        super().__init__(detector, "symbol", resource_grid,
                         stream_management, precision=precision,
                         **kwargs)

    def call(self, y, h_hat, err_var, no):
        y_dt, h_desired, s = self._preprocess_inputs(y, h_hat, err_var,
                                                     no)
        z = self._detector(y_dt, h_desired, s)
        z = self._extract_datasymbols(z)  # [b, tx, s, n_data, 2]
        x_hat = z[..., 0]
        no_eff = jnp.real(z[..., 1])
        return x_hat, no_eff


class LMMSEEqualizer(OFDMEqualizer):
    """LMMSE OFDM equalizer (reference equalization.py:277)."""

    def __init__(self, resource_grid, stream_management,
                 whiten_interference=True, precision=None, **kwargs):
        def eq(y, h, s, precision=None):
            return lmmse_equalizer(y, h, s,
                                   whiten_interference=whiten_interference,
                                   precision=precision)
        super().__init__(eq, resource_grid, stream_management,
                         precision=precision, **kwargs)


class ZFEqualizer(OFDMEqualizer):
    """ZF OFDM equalizer (reference equalization.py:346)."""

    def __init__(self, resource_grid, stream_management, precision=None,
                 **kwargs):
        super().__init__(zf_equalizer, resource_grid,
                         stream_management, precision=precision,
                         **kwargs)


class MFEqualizer(OFDMEqualizer):
    """MF OFDM equalizer (reference equalization.py:405)."""

    def __init__(self, resource_grid, stream_management, precision=None,
                 **kwargs):
        super().__init__(mf_equalizer, resource_grid,
                         stream_management, precision=precision,
                         **kwargs)
