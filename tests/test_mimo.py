"""Tests for MIMO equalization, detection, and precoding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sionna_tpu.phy.mimo import (
    lmmse_equalizer, zf_equalizer, mf_equalizer, lmmse_matrix,
    whiten_channel, complex2real_channel, real2complex_channel,
    complex2real_matrix, real2complex_matrix, LinearDetector,
    MaximumLikelihoodDetector, KBestDetector, EPDetector,
    MMSEPICDetector, rzf_precoding_matrix, cbf_precoding_matrix,
    rzf_precoder, grid_of_beams_dft_ula, StreamManagement)
from sionna_tpu.phy.mapping import Mapper, BinarySource, QAMSource
from sionna_tpu.phy.utils import hard_decisions


def make_channel(batch, m, k, no, seed=0):
    """Random MIMO channel with QAM input."""
    rng = np.random.default_rng(seed)
    h = (rng.normal(size=(batch, m, k))
         + 1j * rng.normal(size=(batch, m, k))) / np.sqrt(2)
    return jnp.asarray(h, jnp.complex64)


def tx_rx(batch, m, k, nbps, no, seed=0):
    rng = np.random.default_rng(seed)
    src = BinarySource(seed=seed)
    mapper = Mapper("qam", nbps)
    b = src([batch, k * nbps])
    x = mapper(b)
    h = make_channel(batch, m, k, no, seed)
    n = (rng.normal(size=(batch, m))
         + 1j * rng.normal(size=(batch, m))) * np.sqrt(no / 2)
    y = jnp.einsum("bmk,bk->bm", h, x) + jnp.asarray(n, jnp.complex64)
    s = no * jnp.broadcast_to(jnp.eye(m, dtype=jnp.complex64),
                              (batch, m, m))
    return b, x, y, h, s


def test_lmmse_equalizer_recovers_high_snr():
    b, x, y, h, s = tx_rx(16, 8, 4, 4, 1e-4)
    x_hat, no_eff = lmmse_equalizer(y, h, s)
    np.testing.assert_allclose(np.asarray(x_hat), np.asarray(x),
                               atol=0.05)
    assert np.all(np.asarray(no_eff) > 0)


def test_zf_mf_equalizers():
    b, x, y, h, s = tx_rx(16, 8, 4, 4, 1e-4)
    x_zf, no_zf = zf_equalizer(y, h, s)
    np.testing.assert_allclose(np.asarray(x_zf), np.asarray(x),
                               atol=0.05)
    x_mf, no_mf = mf_equalizer(y, h, s)
    # MF suffers inter-stream interference; error is bounded and its
    # no_eff reflects that (larger than ZF's at high SNR)
    assert np.mean(np.abs(np.asarray(x_mf) - np.asarray(x))) < 1.0
    assert np.mean(np.asarray(no_mf)) > np.mean(np.asarray(no_zf))


def test_lmmse_matrix_identity():
    h = make_channel(4, 6, 3, 0.1)
    g = lmmse_matrix(h)
    gh = np.asarray(jnp.matmul(g, h))
    # diag(GH) close to (but below) 1
    d = np.diagonal(gh, axis1=-2, axis2=-1).real
    assert np.all(d > 0.5) and np.all(d <= 1.0 + 1e-5)


def test_whiten_channel():
    rng = np.random.default_rng(1)
    m = 4
    a = rng.normal(size=(8, m, m)) + 1j * rng.normal(size=(8, m, m))
    s = np.matmul(a, a.conj().swapaxes(-2, -1)) + np.eye(m)
    y = jnp.asarray(rng.normal(size=(8, m)), jnp.complex64)
    h = make_channel(8, m, 2, 0.1)
    yw, hw, sw = whiten_channel(y, h, jnp.asarray(s, jnp.complex64))
    np.testing.assert_allclose(np.asarray(sw),
                               np.broadcast_to(np.eye(m), (8, m, m)))


def test_complex_real_roundtrip():
    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.normal(size=(4, 6))
                    + 1j * rng.normal(size=(4, 6)), jnp.complex64)
    h = make_channel(4, 6, 3, 0.1)
    s = 0.1 * jnp.broadcast_to(jnp.eye(6, dtype=jnp.complex64),
                               (4, 6, 6))
    yr, hr, sr = complex2real_channel(y, h, s)
    assert yr.shape == (4, 12) and hr.shape == (4, 12, 6)
    yc, hc, sc = real2complex_channel(yr, hr, sr)
    np.testing.assert_allclose(np.asarray(yc), np.asarray(y), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(hc), np.asarray(h), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(s),
                               atol=1e-6)


def test_linear_detector():
    nbps = 2
    b, x, y, h, s = tx_rx(32, 8, 4, nbps, 0.01)
    det = LinearDetector("lmmse", "bit", "app", "qam", nbps)
    llr = det(y, h, s)
    assert llr.shape == (32, 4, nbps)
    b_hat = np.asarray(hard_decisions(llr)).reshape(32, -1)
    np.testing.assert_array_equal(b_hat, np.asarray(b))


def test_ml_detector_bits():
    nbps = 2
    b, x, y, h, s = tx_rx(32, 4, 2, nbps, 0.01)
    det = MaximumLikelihoodDetector("bit", "app", 2, "qam", nbps)
    llr = det(y, h, s)
    assert llr.shape == (32, 2, nbps)
    b_hat = np.asarray(hard_decisions(llr)).reshape(32, -1)
    np.testing.assert_array_equal(b_hat, np.asarray(b))


def test_ml_detector_symbols():
    nbps = 2
    b, x, y, h, s = tx_rx(16, 4, 2, nbps, 0.01)
    det = MaximumLikelihoodDetector("symbol", "maxlog", 2, "qam", nbps,
                                    hard_out=True)
    idx = np.asarray(det(y, h, s))
    # recover symbols from indices
    from sionna_tpu.phy.mapping import qam
    pts = qam(nbps)
    np.testing.assert_allclose(pts[idx], np.asarray(x), atol=1e-5)


def test_ml_beats_linear_at_low_snr():
    # average BER over a batch: ML <= LMMSE
    nbps = 2
    b, x, y, h, s = tx_rx(512, 2, 2, nbps, 0.5, seed=3)
    ml = MaximumLikelihoodDetector("bit", "app", 2, "qam", nbps)
    lin = LinearDetector("lmmse", "bit", "app", "qam", nbps)
    ber_ml = np.mean(np.asarray(hard_decisions(ml(y, h, s))).reshape(
        512, -1) != np.asarray(b))
    ber_lin = np.mean(np.asarray(hard_decisions(lin(y, h, s))).reshape(
        512, -1) != np.asarray(b))
    assert ber_ml <= ber_lin + 0.01


def test_kbest_detector():
    nbps = 2
    b, x, y, h, s = tx_rx(32, 4, 2, nbps, 0.01)
    det = KBestDetector("bit", 2, 16, "qam", nbps)
    llr = det(y, h, s)
    assert llr.shape == (32, 2, nbps)
    b_hat = np.asarray(hard_decisions(llr)).reshape(32, -1)
    np.testing.assert_array_equal(b_hat, np.asarray(b))


def test_kbest_full_k_matches_ml():
    # with K = num_points^K (full enumeration) K-best = maxlog ML
    nbps = 2
    b, x, y, h, s = tx_rx(64, 4, 2, nbps, 0.1, seed=5)
    kb = KBestDetector("bit", 2, 16, "qam", nbps)
    ml = MaximumLikelihoodDetector("bit", "maxlog", 2, "qam", nbps)
    llr_kb = hard_decisions(kb(y, h, s))
    llr_ml = hard_decisions(ml(y, h, s))
    np.testing.assert_array_equal(np.asarray(llr_kb),
                                  np.asarray(llr_ml))


def test_kbest_hard_symbols():
    nbps = 4
    b, x, y, h, s = tx_rx(16, 8, 3, nbps, 0.001)
    det = KBestDetector("symbol", 3, 16, "qam", nbps, hard_out=True)
    idx = np.asarray(det(y, h, s))
    from sionna_tpu.phy.mapping import qam
    np.testing.assert_allclose(qam(nbps)[idx], np.asarray(x),
                               atol=1e-3)


def test_ep_detector():
    nbps = 4
    b, x, y, h, s = tx_rx(32, 8, 4, nbps, 0.01)
    det = EPDetector("bit", nbps, l=10)
    llr = det(y, h, s)
    assert llr.shape == (32, 4, nbps)
    b_hat = np.asarray(hard_decisions(llr)).reshape(32, -1)
    ber = np.mean(b_hat != np.asarray(b))
    assert ber < 0.01


def test_mmse_pic_detector():
    nbps = 2
    b, x, y, h, s = tx_rx(32, 8, 4, nbps, 0.01)
    det = MMSEPICDetector("bit", num_iter=2, constellation_type="qam",
                          num_bits_per_symbol=nbps)
    llr = det(y, h, s)
    assert llr.shape == (32, 4, nbps)
    b_hat = np.asarray(hard_decisions(llr)).reshape(32, -1)
    np.testing.assert_array_equal(b_hat, np.asarray(b))


def test_mmse_pic_with_prior_improves():
    nbps = 2
    b, x, y, h, s = tx_rx(256, 2, 2, nbps, 0.3, seed=7)
    det = MMSEPICDetector("bit", num_iter=2, constellation_type="qam",
                          num_bits_per_symbol=nbps)
    llr_no_prior = det(y, h, s)
    # perfect prior: true bits as strong LLRs
    b_resh = np.asarray(b).reshape(256, 2, nbps)
    prior = jnp.asarray((2 * b_resh - 1) * 6.0, jnp.float32)
    llr_prior = det(y, h, s, prior=prior)
    ber0 = np.mean(np.asarray(hard_decisions(llr_no_prior)).reshape(
        256, -1) != np.asarray(b))
    ber1 = np.mean(np.asarray(hard_decisions(llr_prior)).reshape(
        256, -1) != np.asarray(b))
    assert ber1 <= ber0


def test_rzf_precoding():
    rng = np.random.default_rng(8)
    k, m = 2, 8
    h = jnp.asarray(rng.normal(size=(16, k, m))
                    + 1j * rng.normal(size=(16, k, m)), jnp.complex64)
    g = rzf_precoding_matrix(h)
    assert g.shape == (16, m, k)
    # unit column power
    np.testing.assert_allclose(
        np.sum(np.abs(np.asarray(g)) ** 2, axis=-2), 1.0, rtol=1e-5)
    # zero-forcing: H G is (nearly) diagonal
    hg = np.asarray(jnp.matmul(h, g))
    off = hg - np.einsum("bkk->bk", hg)[:, :, None] * np.eye(k)
    assert np.max(np.abs(off)) < 0.1 * np.max(np.abs(hg))


def test_cbf_precoding():
    h = make_channel(4, 2, 8, 0.1).transpose(0, 2, 1)  # [b, K=8?...]
    h = make_channel(4, 8, 2, 0.1).transpose(0, 2, 1)  # [b, 2, 8]
    g = cbf_precoding_matrix(h)
    assert g.shape == (4, 8, 2)
    np.testing.assert_allclose(
        np.sum(np.abs(np.asarray(g)) ** 2, axis=-2), 1.0, rtol=1e-5)


def test_grid_of_beams():
    gob = np.asarray(grid_of_beams_dft_ula(4))
    assert gob.shape == (4, 4)
    # orthonormal beams
    gram = gob @ gob.conj().T
    np.testing.assert_allclose(gram, np.eye(4), atol=1e-6)
