"""End-to-end tests for OFDM channel estimation + detection: the
BASELINE config #3 chain (MIMO-OFDM over CDL with LS estimation and
LMMSE detection)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sionna_tpu.phy import config
from sionna_tpu.phy.mapping import BinarySource, Mapper
from sionna_tpu.phy.mimo import StreamManagement
from sionna_tpu.phy.ofdm import (
    ResourceGrid, ResourceGridMapper, LSChannelEstimator,
    LinearDetector, KBestDetector, EPDetector, MMSEPICDetector,
    LMMSEEqualizer, LMMSEInterpolator, tdl_freq_cov_mat,
    tdl_time_cov_mat)
from sionna_tpu.phy.channel import OFDMChannel, RayleighBlockFading
from sionna_tpu.phy.channel.tr38901 import CDL, Antenna, AntennaArray
from sionna_tpu.phy.utils import ebnodb2no, hard_decisions


NBPS = 2


def build_link(num_tx_ant=2, num_rx_ant=4, pilot_inds=(2, 11)):
    rg = ResourceGrid(num_ofdm_symbols=14, fft_size=32,
                      subcarrier_spacing=30e3, num_tx=1,
                      num_streams_per_tx=num_tx_ant,
                      pilot_pattern="kronecker",
                      pilot_ofdm_symbol_indices=list(pilot_inds))
    sm = StreamManagement(np.array([[1]]), num_tx_ant)
    return rg, sm


def run_chain(detector_fn, interpolation="nn", ebno_db=20.0, batch=8,
              seed=1, perfect_csi=False):
    config.seed = seed
    num_tx_ant, num_rx_ant = 2, 4
    rg, sm = build_link(num_tx_ant, num_rx_ant)
    src = BinarySource()
    mapper = Mapper("qam", NBPS)
    rg_mapper = ResourceGridMapper(rg)
    ch_model = RayleighBlockFading(1, num_rx_ant, 1, num_tx_ant)
    channel = OFDMChannel(ch_model, rg, return_channel=True)
    est = LSChannelEstimator(rg, interpolation_type=interpolation)
    det = detector_fn(rg, sm)

    no = ebnodb2no(ebno_db, NBPS, 1.0)
    b = src([batch, 1, num_tx_ant, int(rg.num_data_symbols) * NBPS])
    x = mapper(b)
    x_rg = rg_mapper(x)
    key = jax.random.PRNGKey(seed)
    y, h = channel(x_rg, no, key=key)
    if perfect_csi:
        from sionna_tpu.phy.ofdm import RemoveNulledSubcarriers
        h_hat = RemoveNulledSubcarriers(rg)(h)
        err_var = jnp.zeros((1,) * 7, jnp.float32)
    else:
        h_hat, err_var = est(y, no)
    llr = det(y, h_hat, err_var, no)
    return np.asarray(b), np.asarray(hard_decisions(llr))


def test_ls_estimator_accuracy():
    # flat channel: LS + nn interpolation recovers h well at high SNR
    config.seed = 5
    rg, sm = build_link()
    ch_model = RayleighBlockFading(1, 4, 1, 2)
    channel = OFDMChannel(ch_model, rg, return_channel=True)
    src = BinarySource()
    mapper = Mapper("qam", NBPS)
    rg_mapper = ResourceGridMapper(rg)
    x = mapper(src([4, 1, 2, int(rg.num_data_symbols) * NBPS]))
    y, h = channel(rg_mapper(x), 1e-5, key=jax.random.PRNGKey(0))
    est = LSChannelEstimator(rg, interpolation_type="nn")
    h_hat, err_var = est(y, 1e-5)
    from sionna_tpu.phy.ofdm import RemoveNulledSubcarriers
    h_true = np.asarray(RemoveNulledSubcarriers(rg)(h))
    nmse = (np.mean(np.abs(np.asarray(h_hat) - h_true) ** 2)
            / np.mean(np.abs(h_true) ** 2))
    assert nmse < 1e-2


@pytest.mark.parametrize("interp", ["nn", "lin", "lin_time_avg"])
def test_lmmse_detection_ls_estimation(interp):
    b, b_hat = run_chain(
        lambda rg, sm: LinearDetector("lmmse", "bit", "app", rg, sm,
                                      "qam", NBPS),
        interpolation=interp)
    ber = np.mean(b != b_hat)
    assert ber < 0.01, ber


def test_lmmse_interpolator():
    rg, sm = build_link()
    r_f = tdl_freq_cov_mat("A", rg.subcarrier_spacing,
                           rg.num_effective_subcarriers, 100e-9)
    r_t = tdl_time_cov_mat("A", 1.0, 3.5e9,
                           rg.ofdm_symbol_duration,
                           rg.num_ofdm_symbols)
    interp = LMMSEInterpolator(rg.pilot_pattern, r_t, r_f,
                               order="f-t")
    est = LSChannelEstimator(rg, interpolator=interp)
    ch_model = RayleighBlockFading(1, 4, 1, 2)
    channel = OFDMChannel(ch_model, rg, return_channel=True)
    src = BinarySource()
    mapper = Mapper("qam", NBPS)
    x = mapper(src([2, 1, 2, int(rg.num_data_symbols) * NBPS]))
    y, h = channel(ResourceGridMapper(rg)(x), 0.001,
                   key=jax.random.PRNGKey(2))
    h_hat, err_var = est(y, 0.001)
    assert h_hat.shape == (2, 1, 4, 1, 2, 14, 32)


def test_kbest_ofdm_detection():
    b, b_hat = run_chain(
        lambda rg, sm: KBestDetector("bit", 2, 8, rg, sm, "qam", NBPS))
    assert np.mean(b != b_hat) < 0.01


def test_ep_ofdm_detection():
    b, b_hat = run_chain(
        lambda rg, sm: EPDetector("bit", rg, sm, NBPS, l=5))
    assert np.mean(b != b_hat) < 0.01


def test_mmse_pic_ofdm_detection():
    # reference call signature: (y, h_hat, prior, err_var, no) with
    # prior=None on the first IDD pass
    def make(rg, sm):
        det = MMSEPICDetector("bit", rg, sm, num_iter=2,
                              constellation_type="qam",
                              num_bits_per_symbol=NBPS)
        return lambda y, h_hat, err_var, no: det(y, h_hat, None,
                                                 err_var, no)
    b, b_hat = run_chain(make)
    assert np.mean(b != b_hat) < 0.01


def test_mmse_pic_ofdm_per_re_prior_idd():
    """Per-data-RE priors (the IDD feedback layout, reference
    detection.py:1119): a perfect decoder prior must beat the
    prior-less pass at low SNR, and the per-stream broadcast layout
    must still be accepted."""
    config.seed = 7
    num_tx_ant, num_rx_ant = 2, 4
    rg, sm = build_link(num_tx_ant, num_rx_ant)
    src = BinarySource()
    mapper = Mapper("qam", NBPS)
    rg_mapper = ResourceGridMapper(rg)
    ch_model = RayleighBlockFading(1, num_rx_ant, 1, num_tx_ant)
    channel = OFDMChannel(ch_model, rg, return_channel=True)
    det = MMSEPICDetector("bit", rg, sm, num_iter=1,
                          constellation_type="qam",
                          num_bits_per_symbol=NBPS)
    no = ebnodb2no(0.0, NBPS, 1.0)
    n_data = int(rg.num_data_symbols) * NBPS
    b = src([8, 1, num_tx_ant, n_data])
    y, h = channel(rg_mapper(mapper(b)), no, key=jax.random.PRNGKey(3))
    from sionna_tpu.phy.ofdm import RemoveNulledSubcarriers
    h_hat = RemoveNulledSubcarriers(rg)(h)
    err_var = jnp.zeros((1,) * 7, jnp.float32)

    llr0 = det(y, h_hat, None, err_var, no)
    # perfect per-RE prior: true bits as strong LLRs
    prior = jnp.asarray((2. * b - 1.) * 6.0, jnp.float32)
    llr1 = det(y, h_hat, prior, err_var, no)
    ber0 = np.mean(np.asarray(hard_decisions(llr0)) != np.asarray(b))
    ber1 = np.mean(np.asarray(hard_decisions(llr1)) != np.asarray(b))
    assert ber1 < ber0
    # legacy per-stream layout still accepted (broadcast over REs)
    llr2 = det(y, h_hat, jnp.zeros((8, 1, num_tx_ant, NBPS)),
               err_var, no)
    np.testing.assert_allclose(np.asarray(llr2), np.asarray(llr0),
                               rtol=1e-4, atol=1e-4)


def test_lmmse_equalizer_ofdm():
    config.seed = 3
    rg, sm = build_link()
    src = BinarySource()
    mapper = Mapper("qam", NBPS)
    rg_mapper = ResourceGridMapper(rg)
    ch_model = RayleighBlockFading(1, 4, 1, 2)
    channel = OFDMChannel(ch_model, rg, return_channel=True)
    x = mapper(src([4, 1, 2, int(rg.num_data_symbols) * NBPS]))
    y, h = channel(rg_mapper(x), 1e-4, key=jax.random.PRNGKey(1))
    est = LSChannelEstimator(rg, interpolation_type="nn")
    h_hat, err_var = est(y, 1e-4)
    eq = LMMSEEqualizer(rg, sm)
    x_hat, no_eff = eq(y, h_hat, err_var, 1e-4)
    assert x_hat.shape == (4, 1, 2, int(rg.num_data_symbols))
    np.testing.assert_allclose(np.asarray(x_hat), np.asarray(x),
                               atol=0.1)


def test_cdl_mimo_ofdm_link():
    # BASELINE config #3 structure: CDL + LS + LMMSE detection
    config.seed = 7
    fc = 3.5e9
    num_tx_ant = 2
    ut = AntennaArray(num_rows=1, num_cols=num_tx_ant // 2,
                      polarization="dual", polarization_type="cross",
                      antenna_pattern="omni", carrier_frequency=fc)
    bs = AntennaArray(num_rows=1, num_cols=2, polarization="dual",
                      polarization_type="cross",
                      antenna_pattern="omni", carrier_frequency=fc)
    cdl = CDL("C", 100e-9, fc, ut, bs, "uplink", min_speed=1.0)
    rg, sm = build_link(num_tx_ant=2, num_rx_ant=4)
    src = BinarySource()
    mapper = Mapper("qam", NBPS)
    rg_mapper = ResourceGridMapper(rg)
    channel = OFDMChannel(cdl, rg, return_channel=True,
                          normalize_channel=True)
    est = LSChannelEstimator(rg, interpolation_type="lin")
    det = LinearDetector("lmmse", "bit", "app", rg, sm, "qam", NBPS)

    no = ebnodb2no(20.0, NBPS, 1.0)
    b = src([4, 1, 2, int(rg.num_data_symbols) * NBPS])
    y, h = channel(rg_mapper(mapper(b)), no, key=jax.random.PRNGKey(3))
    h_hat, err_var = est(y, no)
    llr = det(y, h_hat, err_var, no)
    ber = np.mean(np.asarray(hard_decisions(llr)) != np.asarray(b))
    assert ber < 0.05, ber
