"""PUSCH receiver composite (reference:
src/sionna/phy/nr/pusch_receiver.py:15)."""

import numpy as np

import jax.numpy as jnp

from ..block import Block
from ..mimo import StreamManagement
from ..ofdm import OFDMDemodulator, LinearDetector
from ..channel import time_to_ofdm_channel
from .pusch_channel_estimation import PUSCHLSChannelEstimator
from .tb_decoder import TBDecoder
from .layer_mapping import LayerDemapper

__all__ = ["PUSCHReceiver"]


class PUSCHReceiver(Block):
    """Full 5G NR PUSCH receive chain: (OFDM demod) -> channel
    estimation -> MIMO detection -> layer demapping -> TB decoding."""

    def __init__(self, pusch_transmitter, channel_estimator=None,
                 mimo_detector=None, tb_decoder=None,
                 return_tb_crc_status=False, stream_management=None,
                 input_domain="freq", l_min=None, precision=None,
                 **kwargs):
        super().__init__(precision=precision, **kwargs)
        if input_domain not in ("time", "freq"):
            raise ValueError("input_domain must be 'time' or 'freq'")
        self._input_domain = input_domain
        self._return_tb_crc_status = bool(return_tb_crc_status)
        self._resource_grid = pusch_transmitter.resource_grid

        if input_domain == "time":
            if l_min is None:
                raise ValueError(
                    "l_min must be provided for input_domain==time")
            self._l_min = l_min
            self._ofdm_demodulator = OFDMDemodulator(
                fft_size=pusch_transmitter._num_subcarriers,
                l_min=l_min,
                cyclic_prefix_length=pusch_transmitter
                ._cyclic_prefix_length,
                precision=self.precision)

        self._perfect_csi = False
        self._w = None
        if channel_estimator is None:
            self._channel_estimator = PUSCHLSChannelEstimator(
                self._resource_grid,
                pusch_transmitter._dmrs_length,
                pusch_transmitter._dmrs_additional_position,
                pusch_transmitter._num_cdm_groups_without_data,
                interpolation_type="lin", precision=self.precision)
        elif channel_estimator == "perfect":
            self._perfect_csi = True
            if pusch_transmitter._precoding == "codebook":
                w = pusch_transmitter._precoder._w  # [tx, P, L]
                self._w = w[:, None, None]  # [tx, 1, 1, P, L]
        else:
            self._channel_estimator = channel_estimator

        if stream_management is None:
            rx_tx_association = np.ones(
                [1, pusch_transmitter._num_tx], bool)
            self._stream_management = StreamManagement(
                rx_tx_association, pusch_transmitter._num_layers)
        else:
            self._stream_management = stream_management

        if mimo_detector is None:
            self._mimo_detector = LinearDetector(
                "lmmse", "bit", "maxlog",
                pusch_transmitter.resource_grid,
                self._stream_management, "qam",
                pusch_transmitter._num_bits_per_symbol,
                precision=self.precision)
        else:
            self._mimo_detector = mimo_detector

        self._layer_demapper = LayerDemapper(
            pusch_transmitter._layer_mapper,
            num_bits_per_symbol=pusch_transmitter._num_bits_per_symbol,
            precision=self.precision)
        if tb_decoder is None:
            self._tb_decoder = TBDecoder(pusch_transmitter._tb_encoder,
                                         precision=self.precision)
        else:
            self._tb_decoder = tb_decoder

    @property
    def resource_grid(self):
        return self._resource_grid

    def call(self, y, no, h=None):
        if self._input_domain == "time":
            y = self._ofdm_demodulator(y)
        if self._perfect_csi:
            if h is None:
                raise ValueError("h must be provided for perfect CSI")
            h = jnp.asarray(h, self.cdtype)
            if self._input_domain == "time":
                h = time_to_ofdm_channel(h, self._resource_grid,
                                         self._l_min)
            if self._w is not None:
                # apply precoding to the channel:
                # h: [b, rx, rxa, tx, txa, sym, sc]
                h = jnp.transpose(h, (0, 1, 3, 5, 6, 2, 4))
                h = jnp.matmul(h, jnp.asarray(self._w, self.cdtype))
                h = jnp.transpose(h, (0, 1, 5, 2, 6, 3, 4))
            h_hat = h
            err_var = jnp.zeros((1,) * h_hat.ndim, self.rdtype)
        else:
            h_hat, err_var = self._channel_estimator(y, no)
        llr = self._mimo_detector(y, h_hat, err_var, no)
        llr = self._layer_demapper(llr)
        b_hat, tb_crc_status = self._tb_decoder(llr)
        if self._return_tb_crc_status:
            return b_hat, tb_crc_status
        return b_hat
