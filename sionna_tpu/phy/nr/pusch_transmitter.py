"""PUSCH transmitter composite (reference:
src/sionna/phy/nr/pusch_transmitter.py:16)."""

import numpy as np

import jax.numpy as jnp

from ..block import Block
from ..mapping import BinarySource, Mapper
from ..ofdm import ResourceGrid, ResourceGridMapper, OFDMModulator
from .config import Config
from .pusch_config import PUSCHConfig, check_pusch_configs
from .pusch_pilot_pattern import PUSCHPilotPattern
from .pusch_precoder import PUSCHPrecoder
from .tb_encoder import TBEncoder
from .layer_mapping import LayerMapper

__all__ = ["PUSCHTransmitter"]


class PUSCHTransmitter(Block):
    """Full 5G NR PUSCH transmit chain: TB encoding -> QAM mapping ->
    layer mapping -> resource grid (+DMRS) -> optional codebook
    precoding -> optional OFDM modulation."""

    def __init__(self, pusch_configs, return_bits=True,
                 output_domain="freq", precision=None, verbose=False,
                 **kwargs):
        super().__init__(precision=precision, **kwargs)
        if not isinstance(return_bits, bool):
            raise TypeError("return_bits must be bool")
        self._return_bits = return_bits
        if output_domain not in ("time", "freq"):
            raise ValueError("output_domain must be 'time' or 'freq'")
        self._output_domain = output_domain
        self._verbose = bool(verbose)

        if isinstance(pusch_configs, PUSCHConfig):
            pusch_configs = [pusch_configs]
        params = check_pusch_configs(pusch_configs)
        for key, value in params.items():
            setattr(self, f"_{key}", value)
        self._pusch_configs = pusch_configs

        if self._return_bits:
            self._binary_source = BinarySource(precision=self.precision)
        self._tb_encoder = TBEncoder(
            target_tb_size=self._tb_size,
            num_coded_bits=self._num_coded_bits,
            target_coderate=self._target_coderate,
            num_bits_per_symbol=self._num_bits_per_symbol,
            num_layers=self._num_layers, n_rnti=self._n_rnti,
            n_id=self._n_id, channel_type="PUSCH", codeword_index=0,
            use_scrambler=True, verbose=self._verbose,
            precision=self.precision)
        self._layer_mapper = LayerMapper(num_layers=self._num_layers,
                                         precision=self.precision)
        self._mapper = Mapper("qam", self._num_bits_per_symbol,
                              precision=self.precision)
        self._pilot_pattern = PUSCHPilotPattern(self._pusch_configs,
                                                precision=self.precision)
        self._resource_grid = ResourceGrid(
            num_ofdm_symbols=self._num_ofdm_symbols,
            fft_size=self._num_subcarriers,
            subcarrier_spacing=self._subcarrier_spacing,
            num_tx=self._num_tx, num_streams_per_tx=self._num_layers,
            cyclic_prefix_length=self._cyclic_prefix_length,
            pilot_pattern=self._pilot_pattern,
            precision=self.precision)
        self._resource_grid_mapper = ResourceGridMapper(
            self._resource_grid, precision=self.precision)
        if self._precoding == "codebook":
            self._precoder = PUSCHPrecoder(self._precoding_matrices,
                                           precision=self.precision)
        if self._output_domain == "time":
            self._ofdm_modulator = OFDMModulator(
                self._cyclic_prefix_length, precision=self.precision)

    @property
    def resource_grid(self):
        return self._resource_grid

    @property
    def pilot_pattern(self):
        return self._pilot_pattern

    def show(self):
        self._pusch_configs[0].carrier.show()
        Config.show(self._pusch_configs[0])
        for idx, p in enumerate(self._pusch_configs):
            print(f"---- UE {idx} ----")
            p.dmrs.show()
            p.tb.show()

    def call(self, inputs, key=None):
        if self._return_bits:
            batch_size = inputs
            b = self._binary_source(
                [batch_size, self._num_tx, self._tb_size], key=key)
        else:
            b = jnp.asarray(inputs, self.rdtype)
        c = self._tb_encoder(b)
        x_map = self._mapper(c)
        x_layer = self._layer_mapper(x_map)
        x_grid = self._resource_grid_mapper(x_layer)
        if self._precoding == "codebook":
            x_pre = self._precoder(x_grid)
        else:
            x_pre = x_grid
        if self._output_domain == "time":
            x = self._ofdm_modulator(x_pre)
        else:
            x = x_pre
        if self._return_bits:
            return x, b
        return x
