"""Tests for channel wave 1: Rayleigh/flat fading, CIR conversions,
apply operators, discrete channels, optical."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sionna_tpu.phy import config
from sionna_tpu.phy.channel import (
    RayleighBlockFading, FlatFadingChannel, KroneckerModel,
    GenerateFlatFadingChannel, ApplyOFDMChannel, ApplyTimeChannel,
    GenerateOFDMChannel, OFDMChannel, TimeChannel, CIRDataset,
    BinarySymmetricChannel, BinaryErasureChannel, BinaryZChannel,
    subcarrier_frequencies, cir_to_ofdm_channel, cir_to_time_channel,
    time_lag_discrete_time_channel, time_to_ofdm_channel, exp_corr_mat)
from sionna_tpu.phy.channel.optical import SSFM, EDFA
from sionna_tpu.phy.ofdm import ResourceGrid
from sionna_tpu.phy.mapping import QAMSource, BinarySource


def test_subcarrier_frequencies():
    f = np.asarray(subcarrier_frequencies(4, 15e3))
    np.testing.assert_allclose(f, [-30e3, -15e3, 0, 15e3])
    f = np.asarray(subcarrier_frequencies(5, 15e3))
    np.testing.assert_allclose(f, [-30e3, -15e3, 0, 15e3, 30e3])


def test_rayleigh_block_fading():
    ch = RayleighBlockFading(num_rx=2, num_rx_ant=4, num_tx=1,
                             num_tx_ant=2)
    a, tau = ch(batch_size=100, num_time_steps=3)
    assert a.shape == (100, 2, 4, 1, 2, 1, 3)
    assert tau.shape == (100, 2, 1, 1)
    # constant over time
    a_np = np.asarray(a)
    np.testing.assert_array_equal(a_np[..., 0], a_np[..., 2])
    # unit average power
    assert float(jnp.mean(jnp.abs(a[..., 0]) ** 2)) == pytest.approx(
        1.0, rel=0.1)


def test_cir_to_ofdm_channel_single_path():
    # one path at tau=0 -> flat frequency response equal to a
    a = jnp.ones((1, 1, 1, 1, 1, 1, 1), jnp.complex64) * (0.5 + 0.5j)
    tau = jnp.zeros((1, 1, 1, 1), jnp.float32)
    freqs = subcarrier_frequencies(16, 15e3)
    h_f = np.asarray(cir_to_ofdm_channel(freqs, a, tau))
    assert h_f.shape == (1, 1, 1, 1, 1, 1, 16)
    np.testing.assert_allclose(h_f, 0.5 + 0.5j, rtol=1e-6)


def test_cir_to_ofdm_channel_delay_phase():
    # single path with delay: linear phase across frequency
    tau0 = 1e-6
    a = jnp.ones((1, 1, 1, 1, 1, 1, 1), jnp.complex64)
    tau = jnp.full((1, 1, 1, 1), tau0, jnp.float32)
    freqs = subcarrier_frequencies(8, 15e3)
    h_f = np.asarray(cir_to_ofdm_channel(freqs, a, tau))[0,0,0,0,0,0]
    expected = np.exp(-2j * np.pi * np.asarray(freqs) * tau0)
    np.testing.assert_allclose(h_f, expected, rtol=1e-4)


def test_cir_to_time_channel():
    a = jnp.ones((1, 1, 1, 1, 1, 1, 1), jnp.complex64)
    tau = jnp.zeros((1, 1, 1, 1), jnp.float32)
    l_min, l_max = -2, 4
    hm = np.asarray(cir_to_time_channel(1e6, a, tau, l_min, l_max))
    assert hm.shape == (1, 1, 1, 1, 1, 1, 7)
    # sinc centered at lag 0 (index -l_min)
    assert hm[..., -l_min].real == pytest.approx(1.0, rel=1e-5)
    assert abs(hm[..., 0]) < 1e-6


def test_apply_ofdm_channel_siso():
    app = ApplyOFDMChannel()
    x = QAMSource(2)([3, 1, 1, 2, 8])
    h = jnp.ones((3, 1, 1, 1, 1, 2, 8), jnp.complex64) * 2.0
    y = app(x, h)
    np.testing.assert_allclose(np.asarray(y),
                               2 * np.asarray(x).reshape(3, 1, 1, 2, 8),
                               rtol=1e-5)


def test_apply_time_channel_is_convolution():
    t, l_tot = 16, 4
    app = ApplyTimeChannel(t, l_tot)
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(1, 1, 1, t))
         + 1j * rng.normal(size=(1, 1, 1, t))).astype(np.complex64)
    taps = (rng.normal(size=l_tot)
            + 1j * rng.normal(size=l_tot)).astype(np.complex64)
    h = np.tile(taps, (1, 1, 1, 1, 1, t + l_tot - 1, 1)).astype(
        np.complex64)
    y = np.asarray(app(jnp.asarray(x), jnp.asarray(h)))
    want = np.convolve(x[0, 0, 0], taps, mode="full")
    np.testing.assert_allclose(y[0, 0, 0], want, rtol=1e-4, atol=1e-5)


def test_ofdm_channel_composite():
    rg = ResourceGrid(num_ofdm_symbols=2, fft_size=16,
                      subcarrier_spacing=15e3)
    ch_model = RayleighBlockFading(1, 2, 1, 1)
    ch = OFDMChannel(ch_model, rg, return_channel=True)
    x = QAMSource(2)([4, 1, 1, 2, 16])
    y, h = ch(x, no=0.01, key=jax.random.PRNGKey(0))
    assert y.shape == (4, 1, 2, 2, 16)
    assert h.shape == (4, 1, 2, 1, 1, 2, 16)
    # flat channel: y ~ h*x at high SNR
    y_np, h_np = np.asarray(y), np.asarray(h)
    x_np = np.asarray(x)
    np.testing.assert_allclose(
        y_np, (h_np * x_np[:, None, None]).sum((3, 4)), atol=0.5)


def test_time_channel_composite():
    ch_model = RayleighBlockFading(1, 1, 1, 1)
    t = 32
    ch = TimeChannel(ch_model, bandwidth=1e6, num_time_samples=t,
                     l_min=-2, l_max=3, return_channel=True)
    x = QAMSource(2)([2, 1, 1, t])
    y, h = ch(x, no=0.001, key=jax.random.PRNGKey(1))
    assert y.shape == (2, 1, 1, t + 6 - 1)
    assert h.shape == (2, 1, 1, 1, 1, t + 6 - 1, 6)


def test_time_to_ofdm_channel_consistency():
    # flat (zero-delay) channel: freq response constant = tap sum
    rg = ResourceGrid(num_ofdm_symbols=1, fft_size=32,
                      subcarrier_spacing=15e3, cyclic_prefix_length=8)
    a = jnp.ones((1, 1, 1, 1, 1, 1, 1), jnp.complex64)
    tau = jnp.zeros((1, 1, 1, 1), jnp.float32)
    l_min, l_max = -4, 6
    hm = cir_to_time_channel(rg.bandwidth, a, tau, l_min, l_max)
    hm_t = jnp.tile(hm, (1, 1, 1, 1, 1, rg.num_time_samples, 1))
    h_f = np.asarray(time_to_ofdm_channel(hm_t, rg, l_min))
    np.testing.assert_allclose(np.abs(h_f), 1.0, rtol=1e-2)


def test_flat_fading_with_correlation():
    r_rx = np.asarray(exp_corr_mat(0.9, 4, precision="double"))
    r_tx = np.asarray(exp_corr_mat(0.5, 2, precision="double"))
    gen = GenerateFlatFadingChannel(
        2, 4, spatial_corr=KroneckerModel(r_tx, r_rx))
    h = gen(10000, key=jax.random.PRNGKey(0))
    h_np = np.asarray(h)
    # empirical receive correlation ~ r_rx (columns averaged)
    r_emp = np.einsum("bmk,bnk->mn", h_np, h_np.conj()) / (10000 * 2)
    np.testing.assert_allclose(r_emp, r_rx, atol=0.1)


def test_flat_fading_channel_block():
    ch = FlatFadingChannel(4, 8, add_awgn=True, return_channel=True)
    x = QAMSource(2)([64, 4])
    y, h = ch(x, no=0.01, key=jax.random.PRNGKey(0))
    assert y.shape == (64, 8)
    assert h.shape == (64, 8, 4)


def test_bsc():
    bsc = BinarySymmetricChannel()
    x = BinarySource()([10, 10000])
    y = bsc(x, 0.1, key=jax.random.PRNGKey(0))
    flips = float(jnp.mean(jnp.abs(y - x)))
    assert flips == pytest.approx(0.1, rel=0.1)


def test_bsc_llr_out():
    bsc = BinarySymmetricChannel(return_llrs=True)
    x = BinarySource()([1, 1000])
    y = np.asarray(bsc(x, 0.2, key=jax.random.PRNGKey(0)))
    # LLR magnitude = log((1-p)/p)
    expected = np.log(0.8 / 0.2)
    np.testing.assert_allclose(np.abs(y), expected, rtol=1e-3)


def test_bec():
    bec = BinaryErasureChannel()
    x = BinarySource()([10, 10000])
    y = np.asarray(bec(x, 0.3, key=jax.random.PRNGKey(0)))
    frac_erased = np.mean(y == -1)
    assert frac_erased == pytest.approx(0.3, rel=0.1)
    # non-erased positions unchanged
    mask = y != -1
    np.testing.assert_array_equal(y[mask], np.asarray(x)[mask])


def test_z_channel():
    zc = BinaryZChannel()
    x = jnp.ones((1, 10000), jnp.float32)
    y = np.asarray(zc(x, 0.25, key=jax.random.PRNGKey(0)))
    assert np.mean(y == 0) == pytest.approx(0.25, rel=0.15)
    x0 = jnp.zeros((1, 10000), jnp.float32)
    y0 = np.asarray(zc(x0, 0.25, key=jax.random.PRNGKey(1)))
    assert np.all(y0 == 0)  # 0 -> 0 always


def test_discrete_channel_gradient():
    bsc = BinarySymmetricChannel(return_llrs=True)
    x = BinarySource()([1, 64])

    def loss(p):
        y = bsc(x, p, key=jax.random.PRNGKey(0))
        return jnp.mean(y ** 2)

    g = jax.grad(loss)(0.1)
    assert np.isfinite(float(g))


def test_cir_dataset():
    a0 = np.ones((1, 2, 1, 2, 3, 4), np.complex64)
    tau0 = np.zeros((1, 1, 3), np.float32)

    def gen():
        while True:
            yield a0, tau0

    ds = CIRDataset(gen, batch_size=5, num_rx=1, num_rx_ant=2,
                    num_tx=1, num_tx_ant=2, num_paths=3,
                    num_time_steps=4)
    a, tau = ds()
    assert a.shape == (5, 1, 2, 1, 2, 3, 4)
    assert tau.shape == (5, 1, 1, 3)


def test_ssfm_dispersion_only_preserves_energy():
    ssfm = SSFM(n_ssfm=4, with_attenuation=False,
                with_nonlinearity=False, with_amplification=False,
                length=80)
    x = QAMSource(2)([2, 256])
    y = ssfm(x, key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.sum(np.abs(np.asarray(y)) ** 2, -1),
        np.sum(np.abs(np.asarray(x)) ** 2, -1), rtol=1e-4)


def test_ssfm_attenuation():
    ssfm = SSFM(n_ssfm=2, alpha=0.046, length=80,
                with_nonlinearity=False, with_dispersion=False)
    x = jnp.ones((1, 64), jnp.complex64)
    y = np.asarray(ssfm(x, key=jax.random.PRNGKey(0)))
    expected = np.exp(-0.046 / 2 * 80)
    np.testing.assert_allclose(np.abs(y), expected, rtol=1e-4)


def test_ssfm_nonlinear_phase():
    # nonlinearity only: |y| = |x|, phase rotated by gamma*|x|^2*L
    ssfm = SSFM(n_ssfm=1, with_attenuation=False, with_dispersion=False,
                gamma=1.27, length=10)
    x = jnp.ones((1, 8), jnp.complex64) * 0.1
    y = np.asarray(ssfm(x, key=jax.random.PRNGKey(0)))
    np.testing.assert_allclose(np.abs(y), 0.1, rtol=1e-5)
    expected_phase = -1.27 * 0.01 * 10
    np.testing.assert_allclose(np.angle(y), expected_phase, rtol=1e-3)


def test_edfa():
    edfa = EDFA(g=4.0, f=2.0, dt=1e-12)
    x = jnp.ones((1, 1000), jnp.complex64)
    y = np.asarray(edfa(x, key=jax.random.PRNGKey(0)))
    # mean field amplified by sqrt(g)
    assert np.mean(y.real) == pytest.approx(2.0, rel=0.05)
