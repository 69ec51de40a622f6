"""Ported reference integration suite: MIMO-OFDM over CDL
(reference test/integration/test_mimo_ofdm_cdl.py) at CI scale.

Covers the full uplink/downlink x frequency/time-domain x
perfect/estimated-CSI matrix: LDPC -> QAM -> resource grid ->
(RZF precoding) -> CDL channel (OFDM or discrete-time application)
-> (LS estimation) -> LMMSE equalization -> demapping -> decoding.
"""

import numpy as np
import pytest

# Monte-Carlo integration matrix: minutes on one CPU -> slow
# tier (MIMO-OFDM-over-CDL integration matrix); unit-level coverage of the same blocks runs in the
# default tier.
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from sionna_tpu.phy import BinarySource, Mapper, Demapper
from sionna_tpu.phy.mimo import StreamManagement
from sionna_tpu.phy.ofdm import (
    ResourceGrid, ResourceGridMapper, LSChannelEstimator,
    LMMSEEqualizer, OFDMModulator, OFDMDemodulator, RZFPrecoder,
    RemoveNulledSubcarriers)
from sionna_tpu.phy.channel import (
    subcarrier_frequencies, cir_to_ofdm_channel, cir_to_time_channel,
    time_lag_discrete_time_channel, ApplyOFDMChannel,
    ApplyTimeChannel)
from sionna_tpu.phy.channel.tr38901 import CDL, AntennaArray
from sionna_tpu.phy.fec.ldpc import LDPC5GEncoder, LDPC5GDecoder
from sionna_tpu.phy.utils import ebnodb2no, compute_ber


class Model:
    """Reference integration model rebuilt on the JAX stack
    (test_mimo_ofdm_cdl.py:88; reduced FFT size for CI)."""

    def __init__(self, domain, direction, perfect_csi,
                 cdl_model="A", delay_spread=100e-9, speed=3.0,
                 cyclic_prefix_length=6,
                 pilot_ofdm_symbol_indices=(2, 11)):
        self.domain = domain
        self.direction = direction
        self.perfect_csi = perfect_csi
        fc = 2.6e9
        num_ut_ant, num_bs_ant = 2, 4
        self.nbps, self.coderate = 2, 0.5

        self.sm = StreamManagement(np.array([[1]]), num_ut_ant)
        self.rg = ResourceGrid(
            num_ofdm_symbols=14, fft_size=36,
            subcarrier_spacing=15e3, num_tx=1,
            num_streams_per_tx=num_ut_ant,
            cyclic_prefix_length=cyclic_prefix_length,
            num_guard_carriers=[2, 3], dc_null=True,
            pilot_pattern="kronecker",
            pilot_ofdm_symbol_indices=list(pilot_ofdm_symbol_indices))
        self.n = int(self.rg.num_data_symbols) * self.nbps
        self.k = int(self.n * self.coderate)

        ut_array = AntennaArray(
            num_rows=1, num_cols=num_ut_ant // 2,
            polarization="dual", polarization_type="cross",
            antenna_pattern="38.901", carrier_frequency=fc)
        bs_array = AntennaArray(
            num_rows=1, num_cols=num_bs_ant // 2,
            polarization="dual", polarization_type="cross",
            antenna_pattern="38.901", carrier_frequency=fc)
        self.cdl = CDL(cdl_model, delay_spread, fc, ut_array,
                       bs_array, direction, min_speed=speed)
        self.frequencies = subcarrier_frequencies(
            self.rg.fft_size, self.rg.subcarrier_spacing)

        self.src = BinarySource()
        self.enc = LDPC5GEncoder(self.k, self.n)
        self.dec = LDPC5GDecoder(self.enc, hard_out=True)
        self.mapper = Mapper("qam", self.nbps)
        self.rg_mapper = ResourceGridMapper(self.rg)
        self.demapper = Demapper("app", "qam", self.nbps)
        self.ls_est = LSChannelEstimator(self.rg,
                                         interpolation_type="nn")
        self.lmmse_equ = LMMSEEqualizer(self.rg, self.sm)
        self.remove_nulled = RemoveNulledSubcarriers(self.rg)
        if direction == "downlink":
            self.zf_precoder = RZFPrecoder(
                self.rg, self.sm, return_effective_channel=True)
        if domain == "freq":
            self.channel_freq = ApplyOFDMChannel()
        else:
            self.l_min, self.l_max = time_lag_discrete_time_channel(
                self.rg.bandwidth)
            l_tot = self.l_max - self.l_min + 1
            self.l_tot = l_tot
            self.channel_time = ApplyTimeChannel(
                self.rg.num_time_samples, l_tot=l_tot)
            self.modulator = OFDMModulator(cyclic_prefix_length)
            self.demodulator = OFDMDemodulator(
                self.rg.fft_size, self.l_min, cyclic_prefix_length)

    def __call__(self, batch_size, ebno_db, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        rg = self.rg
        no = ebnodb2no(ebno_db, self.nbps, self.coderate, rg)
        b = self.src([batch_size, 1, rg.num_streams_per_tx, self.k],
                     key=k1)
        x_rg = self.rg_mapper(self.mapper(self.enc(b)))

        if self.domain == "time":
            a, tau = self.cdl(batch_size,
                              rg.num_time_samples + self.l_tot - 1,
                              rg.bandwidth, key=k2)
            h_time = cir_to_time_channel(
                rg.bandwidth, a, tau, l_min=self.l_min,
                l_max=self.l_max, normalize=True)
            a_freq = a[..., rg.cyclic_prefix_length:-1:
                       (rg.fft_size + rg.cyclic_prefix_length)]
            a_freq = a_freq[..., :rg.num_ofdm_symbols]
            h_freq = cir_to_ofdm_channel(self.frequencies, a_freq,
                                         tau, normalize=True)
            g = None
            if self.direction == "downlink":
                x_rg, g = self.zf_precoder(x_rg, h_freq)
            y_time = self.channel_time(self.modulator(x_rg), h_time,
                                       no, key=k3)
            y = self.demodulator(y_time)
        else:
            a, tau = self.cdl(batch_size, rg.num_ofdm_symbols,
                              1 / rg.ofdm_symbol_duration, key=k2)
            h_freq = cir_to_ofdm_channel(self.frequencies, a, tau,
                                         normalize=True)
            g = None
            if self.direction == "downlink":
                x_rg, g = self.zf_precoder(x_rg, h_freq)
            y = self.channel_freq(x_rg, h_freq, no, key=k3)

        if self.perfect_csi:
            h_hat = (self.remove_nulled(h_freq)
                     if self.direction == "uplink" else g)
            err_var = 0.0
        else:
            h_hat, err_var = self.ls_est(y, no)
        x_hat, no_eff = self.lmmse_equ(y, h_hat, err_var, no)
        b_hat = self.dec(self.demapper(x_hat, no_eff))
        return b, b_hat


_MATRIX = [
    ("freq", "uplink", False),
    ("freq", "uplink", True),
    ("time", "uplink", False),
    ("freq", "downlink", True),
    ("time", "downlink", False),
]


@pytest.mark.parametrize("domain,direction,perfect_csi", _MATRIX)
def test_mimo_ofdm_cdl(domain, direction, perfect_csi):
    """No NaNs at low SNR; near-error-free at high SNR (the
    reference asserts the same over [0, 10, 20] dB)."""
    model = Model(domain, direction, perfect_csi)
    run = jax.jit(lambda e, key: model(8, e, key))
    key = jax.random.PRNGKey(3)
    bers = []
    for i, ebno in enumerate([0.0, 20.0]):
        b, b_hat = run(jnp.asarray(ebno, jnp.float32),
                       jax.random.fold_in(key, i))
        ber = float(compute_ber(b, b_hat))
        assert not np.isnan(ber)
        bers.append(ber)
    assert bers[1] <= bers[0]
    assert bers[1] < 2e-2, bers
