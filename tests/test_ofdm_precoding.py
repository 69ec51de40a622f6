"""OFDM precoding + post-equalization SINR tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sionna_tpu.phy.ofdm import (
    ResourceGrid, RZFPrecoder, RZFPrecodedChannel, CBFPrecodedChannel,
    EyePrecodedChannel, LMMSEPostEqualizationSINR)
from sionna_tpu.phy.mimo import StreamManagement


def _setup(num_tx=1, num_rx=2, num_tx_ant=4, num_rx_ant=1,
           num_streams_per_tx=2, fft_size=12):
    rg = ResourceGrid(num_ofdm_symbols=2, fft_size=fft_size,
                      subcarrier_spacing=15e3, num_tx=num_tx,
                      num_streams_per_tx=num_streams_per_tx)
    rx_tx = np.zeros((num_rx, num_tx), int)
    rx_tx[:, 0] = 1
    sm = StreamManagement(rx_tx, num_streams_per_tx)
    return rg, sm


def _random_channel(key, b, num_rx, num_rx_ant, num_tx, num_tx_ant,
                    sym, fft):
    k1, k2 = jax.random.split(key)
    shape = (b, num_rx, num_rx_ant, num_tx, num_tx_ant, sym, fft)
    return (jax.random.normal(k1, shape)
            + 1j * jax.random.normal(k2, shape)) / np.sqrt(2.)


def test_rzf_precoder_zero_forcing():
    """ZF precoding (alpha=0) nulls inter-stream interference."""
    rg, sm = _setup()
    prec = RZFPrecoder(rg, sm, return_effective_channel=True)
    b, sym, fft = 3, 2, 12
    h = _random_channel(jax.random.PRNGKey(0), b, 2, 1, 1, 4, sym, fft)
    x = jnp.ones((b, 1, 2, sym, fft), jnp.complex64)
    x_p, h_eff = prec(x, h)
    assert x_p.shape == (b, 1, 4, sym, fft)
    # h_eff: [b, rx=2, rxa=1, tx=1, streams=2, sym, sc_eff]
    h_eff = np.asarray(h_eff)
    assert h_eff.shape == (b, 2, 1, 1, 2, sym, fft)
    # stream s is intended for rx s (one rx antenna each):
    # off-diagonal effective gains must vanish (ZF)
    cross_1 = h_eff[:, 0, 0, 0, 1]   # rx0 sees stream1
    cross_2 = h_eff[:, 1, 0, 0, 0]   # rx1 sees stream0
    assert np.max(np.abs(cross_1)) < 1e-4
    assert np.max(np.abs(cross_2)) < 1e-4
    # desired gains nonzero
    assert np.min(np.abs(h_eff[:, 0, 0, 0, 0])) > 1e-3
    # unit-norm precoding columns: a single active stream radiates
    # unit power per resource element
    x_single = jnp.zeros_like(x).at[:, :, 0].set(1.)
    x_p1, _ = prec(x_single, h)
    p_out = np.sum(np.abs(np.asarray(x_p1)) ** 2, axis=2)
    np.testing.assert_allclose(p_out, 1., rtol=1e-4)


def test_precoded_channel_consistency():
    """RZFPrecodedChannel h_eff matches RZFPrecoder's h_eff for unit
    powers."""
    rg, sm = _setup()
    b, sym, fft = 2, 2, 12
    h = _random_channel(jax.random.PRNGKey(1), b, 2, 1, 1, 4, sym, fft)
    prec = RZFPrecoder(rg, sm, return_effective_channel=True)
    x = jnp.ones((b, 1, 2, sym, fft), jnp.complex64)
    _, h_eff_ref = prec(x, h)
    pc = RZFPrecodedChannel(rg, sm)
    h_eff = pc(h, tx_power=jnp.ones((b, 1, 2)))
    np.testing.assert_allclose(np.asarray(h_eff),
                               np.asarray(h_eff_ref), atol=1e-5)


def test_tx_power_scaling():
    rg, sm = _setup()
    b, sym, fft = 2, 2, 12
    h = _random_channel(jax.random.PRNGKey(2), b, 2, 1, 1, 4, sym, fft)
    pc = CBFPrecodedChannel(rg, sm)
    h1 = np.asarray(pc(h, tx_power=jnp.ones((b, 1, 2))))
    h4 = np.asarray(pc(h, tx_power=4. * jnp.ones((b, 1, 2))))
    np.testing.assert_allclose(h4, 2. * h1, rtol=1e-5)


def test_eye_precoded_channel():
    rg, sm = _setup(num_tx_ant=2, num_streams_per_tx=2)
    b, sym, fft = 2, 2, 12
    h = _random_channel(jax.random.PRNGKey(3), b, 2, 1, 1, 2, sym, fft)
    pc = EyePrecodedChannel(rg, sm)
    h_eff = np.asarray(pc(h, tx_power=jnp.ones((b, 1, 2))))
    # identity precoding: effective channel == original channel
    h_ref = np.transpose(np.asarray(h), (0, 1, 2, 3, 4, 5, 6))
    np.testing.assert_allclose(h_eff, h_ref, atol=1e-6)


def test_lmmse_post_equalization_sinr():
    """High SNR ZF-precoded channel -> SINR >> 1 and scales ~1/no."""
    rg, sm = _setup()
    b, sym, fft = 2, 2, 12
    h = _random_channel(jax.random.PRNGKey(4), b, 2, 1, 1, 4, sym, fft)
    pc = RZFPrecodedChannel(rg, sm)
    h_eff = pc(h, tx_power=jnp.ones((b, 1, 2)))
    sinr_block = LMMSEPostEqualizationSINR(rg, sm)
    sinr_lo = np.asarray(sinr_block(h_eff, no=1e-2))
    sinr_hi = np.asarray(sinr_block(h_eff, no=1e-4))
    assert sinr_lo.shape == (b, sym, fft, 2, 1)
    assert np.all(sinr_lo > 1.)
    # noise-limited (ZF): SINR ~ 1/no
    ratio = sinr_hi / sinr_lo
    np.testing.assert_allclose(ratio, 100., rtol=0.05)


def test_sinr_with_interference():
    """An interfering TX lowers the SINR (whitening handles it)."""
    num_tx, num_rx = 2, 2
    rg = ResourceGrid(num_ofdm_symbols=2, fft_size=12,
                      subcarrier_spacing=15e3, num_tx=num_tx,
                      num_streams_per_tx=1)
    # rx0 <- tx0, rx1 <- tx1; the other TX interferes
    rx_tx = np.eye(2, dtype=int)
    sm = StreamManagement(rx_tx, 1)
    b, sym, fft = 2, 2, 12
    h = _random_channel(jax.random.PRNGKey(5), b, num_rx, 1, num_tx, 4,
                       sym, fft)
    pc = RZFPrecodedChannel(rg, sm)
    sinr_block = LMMSEPostEqualizationSINR(rg, sm)

    h_eff = pc(h, tx_power=jnp.ones((b, num_tx, 1)))
    sinr_full = np.asarray(sinr_block(h_eff, no=1e-3))

    # Same but with the interferer silenced
    power_single = jnp.asarray([1., 0.])[None, :, None]
    h_eff_s = pc(h, tx_power=jnp.broadcast_to(power_single,
                                              (b, num_tx, 1)))
    sinr_single = np.asarray(sinr_block(h_eff_s, no=1e-3))
    # SINR of rx0-stream must be higher without interference
    assert np.median(sinr_single[..., 0, 0] / sinr_full[..., 0, 0]) > 1.
