"""Ports of the remaining reference integration suites:

- test/integration/test_mimo_flat_fading.py — coded MIMO over flat
  fading, uncorrelated and Kronecker-correlated.
- test/integration/test_mimo_ofdm_38901.py — coded MIMO-OFDM uplink
  over the TR 38.901 system-level UMi/UMa/RMa models.
- test/integration/test_mimo_ofdm_estimation_detection.py — all
  detectors with ordered LMMSE ('t-f-s') estimation over a spatially
  correlated TDL-A, including per-RE zero priors for MMSE-PIC.
- test/integration/test_bicm.py — LLR-consistency + interleaved /
  scrambled / all-zero coded-BICM links driven through PlotBER.

Dimensions are reduced vs the reference (single-core CI host); the
assertions mirror the reference's (finite results; BER == 0 at very
high SNR for the detector matrix)."""

import numpy as np
import pytest

# Monte-Carlo integration matrix: minutes on one CPU -> slow
# tier (full reference integration matrix); unit-level coverage of the same blocks runs in the
# default tier.
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from sionna_tpu.phy import config
from sionna_tpu.phy.mapping import (BinarySource, Mapper, Demapper,
                                    Constellation)
from sionna_tpu.phy.mimo import StreamManagement, lmmse_equalizer
from sionna_tpu.phy.channel import (AWGN, FlatFadingChannel,
                                    KroneckerModel, OFDMChannel)
from sionna_tpu.phy.channel.utils import (exp_corr_mat,
                                          gen_single_sector_topology)
from sionna_tpu.phy.channel.tr38901 import TDL, UMi, UMa, RMa, PanelArray
from sionna_tpu.phy.fec.ldpc import LDPC5GEncoder, LDPC5GDecoder
from sionna_tpu.phy.fec.interleaving import (RandomInterleaver,
                                             Deinterleaver)
from sionna_tpu.phy.fec.scrambling import Scrambler, Descrambler
from sionna_tpu.phy.ofdm import (ResourceGrid, ResourceGridMapper,
                                 LSChannelEstimator, LMMSEEqualizer,
                                 LMMSEInterpolator, LinearDetector,
                                 KBestDetector, EPDetector,
                                 MMSEPICDetector,
                                 RemoveNulledSubcarriers,
                                 tdl_freq_cov_mat, tdl_time_cov_mat)
from sionna_tpu.phy.utils import (ebnodb2no, sim_ber, compute_ber,
                                  hard_decisions, PlotBER)


# ------------------------------------------------------------------ #
# 1. MIMO over flat fading (reference test_mimo_flat_fading.py)
# ------------------------------------------------------------------ #

def _flat_fading_model(spatial_corr=None, num_tx_ant=2, num_rx_ant=8,
                       k=256, n=512, nbps=4):
    src = BinarySource()
    enc = LDPC5GEncoder(k, n)
    dec = LDPC5GDecoder(enc, hard_out=True)
    mapper = Mapper("qam", nbps)
    demapper = Demapper("app", "qam", nbps)
    channel = FlatFadingChannel(num_tx_ant, num_rx_ant,
                                spatial_corr=spatial_corr,
                                return_channel=True)

    def run(batch_size, ebno_db, key):
        k1, k2 = jax.random.split(key)
        b = src([batch_size, num_tx_ant, k], key=k1)
        c = enc(b)
        x = mapper(c)
        shape = x.shape
        x = jnp.reshape(x, (-1, num_tx_ant))
        no = ebnodb2no(ebno_db, nbps, k / n) * np.sqrt(num_rx_ant)
        y, h = channel(x, no, key=k2)
        s = (no * jnp.eye(num_rx_ant)).astype(jnp.complex64)
        x_hat, no_eff = lmmse_equalizer(y, h, s)
        llr = demapper(jnp.reshape(x_hat, shape),
                       jnp.reshape(no_eff, shape))
        return b, dec(llr)

    return run


@pytest.mark.parametrize("correlated", [False, True])
def test_mimo_flat_fading(correlated):
    """Reference test_mimo_flat_fading.py: coded MIMO over (possibly
    Kronecker-correlated) flat fading; results must be finite."""
    config.seed = 42
    corr = None
    if correlated:
        corr = KroneckerModel(exp_corr_mat(0.4, 2), exp_corr_mat(0.7, 8))
    run = _flat_fading_model(spatial_corr=corr)
    ber, bler = sim_ber(run, [0., 10., 20.], batch_size=16,
                        max_mc_iter=2, early_stop=False, verbose=False)
    assert np.isfinite(np.asarray(ber)).all()
    assert np.isfinite(np.asarray(bler)).all()
    # at 20 dB with 8 rx antennas the coded link must be clean
    assert float(np.asarray(ber)[-1]) < 1e-2


# ------------------------------------------------------------------ #
# 2. MIMO-OFDM over TR 38.901 UMi/UMa/RMa
#    (reference test_mimo_ofdm_38901.py)
# ------------------------------------------------------------------ #

def _build_38901_link(scenario, perfect_csi, num_ut=2, num_bs_ant=4,
                      fft_size=32, nbps=2, coderate=0.5):
    fc = 3.5e9
    rg = ResourceGrid(num_ofdm_symbols=14, fft_size=fft_size,
                      subcarrier_spacing=30e3, num_tx=num_ut,
                      num_streams_per_tx=1, cyclic_prefix_length=8,
                      pilot_pattern="kronecker",
                      pilot_ofdm_symbol_indices=[2, 11])
    sm = StreamManagement(np.ones([1, num_ut], int), 1)
    ut_array = PanelArray(num_rows_per_panel=1, num_cols_per_panel=1,
                          polarization="single", polarization_type="V",
                          antenna_pattern="omni", carrier_frequency=fc)
    bs_array = PanelArray(num_rows_per_panel=1,
                          num_cols_per_panel=num_bs_ant // 2,
                          polarization="dual",
                          polarization_type="cross",
                          antenna_pattern="38.901",
                          carrier_frequency=fc)
    if scenario == "umi":
        model = UMi(fc, "low", ut_array, bs_array, "uplink",
                    enable_pathloss=False, enable_shadow_fading=False)
    elif scenario == "uma":
        model = UMa(fc, "low", ut_array, bs_array, "uplink",
                    enable_pathloss=False, enable_shadow_fading=False)
    else:
        model = RMa(fc, ut_array, bs_array, "uplink",
                    enable_pathloss=False, enable_shadow_fading=False)

    n = int(rg.num_data_symbols * nbps)
    k = int(n * coderate)
    src = BinarySource()
    enc = LDPC5GEncoder(k, n)
    dec = LDPC5GDecoder(enc, hard_out=True)
    mapper = Mapper("qam", nbps)
    rg_mapper = ResourceGridMapper(rg)
    channel = OFDMChannel(model, rg, normalize_channel=True,
                          return_channel=True)
    rm_nulled = RemoveNulledSubcarriers(rg)
    est = LSChannelEstimator(rg, interpolation_type="nn")
    equ = LMMSEEqualizer(rg, sm)
    demapper = Demapper("app", "qam", nbps)

    def new_topology(batch_size):
        # host-side precompute, like the reference's new_topology()
        # (NOT inside the jitted MC function: scenario LSP tables are
        # trace-time constants in the TPU-first design)
        topo = gen_single_sector_topology(batch_size, num_ut, scenario,
                                          min_ut_velocity=0.,
                                          max_ut_velocity=0.)
        model.set_topology(*topo)

    def run(batch_size, ebno_db, key):
        k1, k2 = jax.random.split(key)
        no = ebnodb2no(ebno_db, nbps, coderate, rg)
        b = src([batch_size, num_ut, 1, k], key=k1)
        x_rg = rg_mapper(mapper(enc(b)))
        y, h = channel(x_rg, no, key=k2)
        if perfect_csi:
            h_hat, err_var = rm_nulled(h), 0.
        else:
            h_hat, err_var = est(y, no)
        x_hat, no_eff = equ(y, h_hat, err_var, no)
        llr = demapper(x_hat, no_eff)
        return b, dec(llr)

    return run, new_topology


@pytest.mark.parametrize("scenario", ["umi", "uma", "rma"])
def test_mimo_ofdm_38901(scenario):
    """Reference test_mimo_ofdm_38901.py: LS estimation + LMMSE
    equalization over the full system-level model; finite results."""
    config.seed = 7
    run, new_topology = _build_38901_link(scenario, perfect_csi=False)
    new_topology(4)
    ber, bler = sim_ber(run, [5., 15.], batch_size=4, max_mc_iter=2,
                        early_stop=False, verbose=False)
    assert np.isfinite(np.asarray(ber)).all()
    assert np.isfinite(np.asarray(bler)).all()


def test_mimo_ofdm_38901_perfect_csi():
    config.seed = 8
    run, new_topology = _build_38901_link("umi", perfect_csi=True)
    new_topology(4)
    ber, bler = sim_ber(run, [15.], batch_size=4, max_mc_iter=2,
                        early_stop=False, verbose=False)
    assert np.isfinite(np.asarray(ber)).all()


# ------------------------------------------------------------------ #
# 3. Estimation + detection matrix over spatially correlated TDL-A
#    (reference test_mimo_ofdm_estimation_detection.py)
# ------------------------------------------------------------------ #

def _build_est_det_link(det_method, output, perfect_csi, num_tx=2,
                        nbps=2, num_rx_ant=4, coderate=0.5):
    fc, scs, ds, speed = 3.5e9, 30e3, 300e-9, 3.
    fft_size = 24  # 2 PRBs
    rg = ResourceGrid(num_ofdm_symbols=14, fft_size=fft_size,
                      subcarrier_spacing=scs, num_tx=1,
                      num_streams_per_tx=num_tx,
                      pilot_pattern="kronecker",
                      pilot_ofdm_symbol_indices=[2, 11])
    sm = StreamManagement([[1]], num_tx)
    rx_corr = exp_corr_mat(0.5, num_rx_ant)
    tx_corr = exp_corr_mat(0.0, num_tx)
    space_corr = np.kron(np.asarray(rx_corr), np.asarray(tx_corr))
    model = TDL("A", delay_spread=ds, carrier_frequency=fc,
                num_rx_ant=num_rx_ant, num_tx_ant=num_tx,
                spatial_corr_mat=jnp.asarray(space_corr))
    channel = OFDMChannel(model, rg, return_channel=True)

    n = int(rg.num_data_symbols * nbps)
    k = int(coderate * n)
    hard_out = output == "symbol"
    coded = output == "bit"
    src = BinarySource()
    mapper = Mapper("qam", nbps, return_indices=True)
    rg_mapper = ResourceGridMapper(rg)
    enc = LDPC5GEncoder(k, n, num_bits_per_symbol=nbps) if coded \
        else None
    dec = LDPC5GDecoder(enc, hard_out=True) if coded else None

    est = None
    if not perfect_csi:
        # ordered per-dimension LMMSE incl. spatial smoothing, the
        # reference's order='t-f-s' configuration
        freq_cov = tdl_freq_cov_mat("A", rg.subcarrier_spacing,
                                    rg.num_effective_subcarriers, ds)
        time_cov = tdl_time_cov_mat("A", speed, fc,
                                    rg.ofdm_symbol_duration,
                                    rg.num_ofdm_symbols)
        interp = LMMSEInterpolator(rg.pilot_pattern, time_cov,
                                   freq_cov, rx_corr, order="t-f-s")
        est = LSChannelEstimator(rg, interpolator=interp)
    rm_nulled = RemoveNulledSubcarriers(rg)

    if det_method == "lmmse":
        det = LinearDetector("lmmse", output, "app", rg, sm, "qam",
                             nbps, hard_out=hard_out)
    elif det_method == "k-best":
        det = KBestDetector(output, num_tx, 16, rg, sm, "qam", nbps,
                            hard_out=hard_out)
    elif det_method == "ep":
        det = EPDetector(output, rg, sm, nbps, l=10, hard_out=hard_out)
    else:
        det = MMSEPICDetector(output, rg, sm, "app", num_iter=4,
                              constellation_type="qam",
                              num_bits_per_symbol=nbps,
                              hard_out=hard_out)

    def run(batch_size, ebno_db, key):
        k1, k2 = jax.random.split(key)
        if coded:
            b = src([batch_size, 1, num_tx, k], key=k1)
            c = enc(b)
        else:
            c = src([batch_size, 1, num_tx, n], key=k1)
        x, x_ind = mapper(c)
        x_rg = rg_mapper(x)
        no = ebnodb2no(ebno_db, nbps, coderate, rg)
        y, h = channel(x_rg, no, key=k2)
        if perfect_csi:
            h_hat, err_var = rm_nulled(h), jnp.asarray(0., jnp.float32)
        else:
            h_hat, err_var = est(y, no)
        if det_method == "mmse-pic":
            # per-RE zero prior in the reference's layout
            if output == "bit":
                prior = jnp.zeros(c.shape, jnp.float32)
            else:
                prior = jnp.zeros(x.shape + (2 ** nbps,), jnp.float32)
            out = det(y, h_hat, prior, err_var, no)
        else:
            out = det(y, h_hat, err_var, no)
        if output == "bit":
            return b, dec(jnp.reshape(out, c.shape))
        return x_ind, jnp.reshape(out, x_ind.shape)

    return run


@pytest.mark.parametrize("det_method", ["lmmse", "ep", "k-best",
                                        "mmse-pic"])
def test_est_det_matrix_bit(det_method):
    """Reference test_all_detectors_in_all_modes (bit output): at
    40 dB with ordered-LMMSE estimation the coded link is error
    free."""
    config.seed = 3
    run = _build_est_det_link(det_method, "bit", perfect_csi=False)
    a, b = jax.jit(lambda key: run(1, 40., key))(jax.random.PRNGKey(1))
    ber = float(compute_ber(jnp.asarray(a, jnp.int32),
                            jnp.asarray(b, jnp.int32)))
    assert ber == 0., (det_method, ber)


@pytest.mark.parametrize("det_method", ["lmmse", "ep", "k-best"])
def test_est_det_matrix_symbol(det_method):
    config.seed = 4
    run = _build_est_det_link(det_method, "symbol", perfect_csi=False)
    a, b = jax.jit(lambda key: run(1, 40., key))(jax.random.PRNGKey(2))
    ser = float(np.mean(np.asarray(a) != np.asarray(b)))
    assert ser == 0., (det_method, ser)


# ------------------------------------------------------------------ #
# 4. BICM (reference test_bicm.py)
# ------------------------------------------------------------------ #

def test_bicm_llr_consistency():
    """Reference test_simple_e2e first half: bitwise BERs of a 16-QAM
    AWGN demapper are finite and roughly symmetric across bits."""
    config.seed = 11
    nbps, ebno_db = 4, 4.
    src, channel = BinarySource(), AWGN()
    const = Constellation("qam", nbps)
    mapper = Mapper(constellation=const)
    demapper = Demapper("app", constellation=const)
    no = ebnodb2no(ebno_db, nbps, 1.)
    b = src([100000, nbps], key=jax.random.PRNGKey(0))
    llr = demapper(channel(mapper(b), no,
                           key=jax.random.PRNGKey(1)), no)
    b_hat = hard_decisions(llr)
    ber_per_bit = np.mean(np.asarray(b != b_hat), axis=0)
    assert np.isfinite(ber_per_bit).all()
    # Gray 16-QAM: the two MSB-class bits are more reliable than the
    # two LSB-class bits
    assert ber_per_bit.mean() < 0.2


def _bicm_model(k, n, nbps, use_allzero=False, use_scrambler=False,
                no_est_mismatch=1.):
    """Port of the reference's LDPC_QAM_AWGN model."""
    src, channel = BinarySource(), AWGN()
    enc = LDPC5GEncoder(k, n)
    dec = LDPC5GDecoder(enc, num_iter=20, hard_out=True)
    mapper = Mapper("qam", nbps)
    demapper = Demapper("app", "qam", nbps)
    scrambler = Scrambler(seed=99) if use_scrambler else None
    descrambler = Descrambler(scrambler, binary=False) \
        if use_scrambler else None

    def run(batch_size, ebno_db, key):
        k1, k2 = jax.random.split(key)
        no = ebnodb2no(ebno_db, nbps, k / n)
        if use_allzero:
            u = jnp.zeros([batch_size, k])
            c = jnp.zeros([batch_size, n])
        else:
            u = src([batch_size, k], key=k1)
            c = enc(u)
        if use_scrambler:
            c = scrambler(c)
        y = channel(mapper(c), no, key=k2)
        llr = demapper(y, no * no_est_mismatch)
        if use_scrambler:
            llr = descrambler(llr)
        u_hat = dec(llr)
        if use_allzero:
            return u, u_hat
        return u, u_hat

    return run


@pytest.mark.parametrize("allzero,scrambler", [(False, False),
                                               (True, True),
                                               (False, True)])
def test_bicm_model_e2e(allzero, scrambler):
    """Reference test_model_e2e: all-zero and scrambled variants
    through PlotBER.simulate; finite BERs, and the all-zero+scrambler
    curve must track the encoded baseline at high SNR (both ~0)."""
    config.seed = 13
    plot = PlotBER("bicm")
    run = _bicm_model(250, 500, 2, use_allzero=allzero,
                      use_scrambler=scrambler)
    ber, _ = plot.simulate(run, ebno_dbs=np.arange(0, 6, 2.5),
                           legend="cfg", max_mc_iter=2, batch_size=16,
                           early_stop=False, show_fig=False,
                           verbose=False)
    ber = np.asarray(ber)
    assert np.isfinite(ber).all()
    assert ber[-1] < 0.05


def test_bicm_interleaved_link():
    """Reference test_simple_e2e second half: random interleaver +
    deinterleaver around the mapper leave the coded link clean."""
    config.seed = 17
    k, n, nbps = 250, 500, 2
    src, channel = BinarySource(), AWGN()
    enc = LDPC5GEncoder(k, n)
    dec = LDPC5GDecoder(enc, num_iter=20, hard_out=True)
    interleaver = RandomInterleaver(seed=1234)
    deinterleaver = Deinterleaver(interleaver)
    mapper = Mapper("qam", nbps)
    demapper = Demapper("app", "qam", nbps)

    def run(batch_size, ebno_db, key):
        k1, k2 = jax.random.split(key)
        no = ebnodb2no(ebno_db, nbps, k / n)
        u = src([batch_size, k], key=k1)
        c_int = interleaver(enc(u))
        llr = demapper(channel(mapper(c_int), no, key=k2), no)
        return u, dec(deinterleaver(llr))

    ber, _ = sim_ber(run, [0., 4.], batch_size=32, max_mc_iter=2,
                     early_stop=False, verbose=False)
    assert np.isfinite(np.asarray(ber)).all()
    assert float(np.asarray(ber)[-1]) < 0.02
