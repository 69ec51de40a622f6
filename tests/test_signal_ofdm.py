"""Tests for the signal package and OFDM core."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sionna_tpu.phy.signal import (
    convolve, fft, ifft, empirical_aclr, RaisedCosineFilter,
    RootRaisedCosineFilter, SincFilter, CustomFilter, HannWindow,
    Upsampling, Downsampling)
from sionna_tpu.phy.ofdm import (
    ResourceGrid, ResourceGridMapper, ResourceGridDemapper,
    RemoveNulledSubcarriers, OFDMModulator, OFDMDemodulator,
    KroneckerPilotPattern, EmptyPilotPattern)
from sionna_tpu.phy.mimo import StreamManagement
from sionna_tpu.phy.mapping import QAMSource


# ----------------------------------------------------------------------
# signal
# ----------------------------------------------------------------------
def test_convolve_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 20)).astype(np.float32)
    k = rng.normal(size=7).astype(np.float32)
    for mode in ("full", "same", "valid"):
        got = np.asarray(convolve(jnp.asarray(x), jnp.asarray(k),
                                  padding=mode))
        for i in range(3):
            want = np.convolve(x[i], k, mode=mode)
            np.testing.assert_allclose(got[i], want, rtol=1e-4,
                                       atol=1e-5)


def test_convolve_complex():
    rng = np.random.default_rng(1)
    x = (rng.normal(size=(2, 16)) + 1j * rng.normal(size=(2, 16))
         ).astype(np.complex64)
    k = (rng.normal(size=5) + 1j * rng.normal(size=5)).astype(np.complex64)
    got = np.asarray(convolve(jnp.asarray(x), jnp.asarray(k), "full"))
    for i in range(2):
        want = np.convolve(x[i], k, mode="full")
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_fft_ifft_normalized():
    rng = np.random.default_rng(2)
    x = (rng.normal(size=(4, 64)) + 1j * rng.normal(size=(4, 64))
         ).astype(np.complex64)
    xf = fft(jnp.asarray(x))
    # Parseval with 1/sqrt(N) scaling: energy preserved
    np.testing.assert_allclose(
        np.sum(np.abs(np.asarray(xf)) ** 2, -1),
        np.sum(np.abs(x) ** 2, -1), rtol=1e-4)
    xr = ifft(xf)
    np.testing.assert_allclose(np.asarray(xr), x, rtol=1e-3, atol=1e-4)


def test_rrc_filter_nyquist():
    # RC filter satisfies the Nyquist criterion: samples at symbol
    # spacing are zero (except center)
    rc = RaisedCosineFilter(span_in_symbols=8, samples_per_symbol=4,
                            beta=0.3, normalize=False)
    h = np.asarray(rc.coefficients)
    center = len(h) // 2
    sym_samples = h[center::4][1:]
    np.testing.assert_allclose(sym_samples, 0, atol=1e-7)
    # RRC * RRC ~ RC: Nyquist zero crossings up to truncation error
    rrc = RootRaisedCosineFilter(span_in_symbols=32,
                                 samples_per_symbol=4, beta=0.3,
                                 normalize=False)
    hh = np.convolve(np.asarray(rrc.coefficients),
                     np.asarray(rrc.coefficients))
    hh_sym = hh[len(hh) // 2::4][1:8] / hh[len(hh) // 2]
    np.testing.assert_allclose(hh_sym, 0, atol=5e-3)


def test_filter_normalization_and_window():
    f = SincFilter(span_in_symbols=6, samples_per_symbol=4,
                   window="hann", normalize=True)
    x = jnp.zeros((1, 50), jnp.float32).at[0, 25].set(1.0)
    y = np.asarray(f(x))
    # unit-energy impulse response
    np.testing.assert_allclose(np.sum(y ** 2), 1.0, rtol=1e-5)


def test_custom_filter():
    coeffs = np.array([0.25, 0.5, 0.25], np.float32)
    f = CustomFilter(samples_per_symbol=2, coefficients=coeffs,
                     normalize=False)
    x = jnp.asarray(np.eye(1, 10, 4, dtype=np.float32))
    y = np.asarray(f(x, padding="same"))
    np.testing.assert_allclose(y[0, 3:6], coeffs, rtol=1e-6)


def test_up_down_sampling():
    up = Upsampling(4)
    down = Downsampling(4)
    x = jnp.asarray(np.arange(12, dtype=np.float32)[None])
    xu = np.asarray(up(x))
    assert xu.shape == (1, 48)
    assert xu[0, 4] == 1 and xu[0, 1] == 0
    xd = np.asarray(down(jnp.asarray(xu)))
    np.testing.assert_array_equal(xd[0], np.arange(12))


def test_aclr():
    rng = np.random.default_rng(3)
    x = (rng.normal(size=(10, 256)) + 1j * rng.normal(size=(10, 256))
         ).astype(np.complex64)
    aclr = float(empirical_aclr(jnp.asarray(x), oversampling=2.0))
    # white noise: half the band is in-band at oversampling 2
    assert aclr == pytest.approx(1.0, rel=0.15)


# ----------------------------------------------------------------------
# OFDM
# ----------------------------------------------------------------------
def make_rg(**kwargs):
    defaults = dict(num_ofdm_symbols=14, fft_size=64,
                    subcarrier_spacing=30e3, num_tx=1,
                    num_streams_per_tx=1, cyclic_prefix_length=16,
                    num_guard_carriers=(4, 3), dc_null=True,
                    pilot_pattern="kronecker",
                    pilot_ofdm_symbol_indices=[2, 11])
    defaults.update(kwargs)
    return ResourceGrid(**defaults)


def test_resource_grid_accounting():
    rg = make_rg()
    assert rg.num_effective_subcarriers == 64 - 7 - 1
    assert rg.num_pilot_symbols == 2 * 56
    assert rg.num_data_symbols == 56 * 14 - 112
    assert rg.num_time_samples == (64 + 16) * 14
    assert rg.dc_ind == 32
    assert rg.bandwidth == 64 * 30e3


def test_rg_mapper_demapper_roundtrip():
    rg = make_rg(num_tx=2, num_streams_per_tx=2)
    sm = StreamManagement(np.array([[1, 1]]), 2)
    mapper = ResourceGridMapper(rg)
    x = QAMSource(4)([4, 2, 2, int(rg.num_data_symbols)])
    grid = mapper(x)
    assert grid.shape == (4, 2, 2, 14, 64)
    # demap: single rx receives all 4 streams
    demapper = ResourceGridDemapper(rg, sm)
    # y has shape [batch, num_rx=1, num_streams_per_rx=4, ...]
    y = jnp.reshape(grid, (4, 1, 4, 14, 64))
    x_hat = demapper(y)
    np.testing.assert_allclose(np.asarray(x_hat), np.asarray(x),
                               rtol=1e-5)


def test_rg_mapper_pilots_placed():
    rg = make_rg()
    mapper = ResourceGridMapper(rg)
    x = jnp.zeros((1, 1, 1, int(rg.num_data_symbols)), jnp.complex64)
    grid = np.asarray(mapper(x))[0, 0, 0]
    # pilot OFDM symbols carry the pilot energy
    pilot_energy = np.abs(grid[[2, 11]]) ** 2
    assert pilot_energy.sum() > 0
    # guards and DC are nulled
    assert np.all(grid[:, :4] == 0)
    assert np.all(grid[:, -3:] == 0)
    assert np.all(grid[:, 32] == 0)


def test_remove_nulled_subcarriers():
    rg = make_rg()
    rm = RemoveNulledSubcarriers(rg)
    grid = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 14, 64)),
        jnp.complex64)
    out = rm(grid)
    assert out.shape == (2, 14, 56)


def test_ofdm_mod_demod_roundtrip():
    rg = make_rg()
    mod = OFDMModulator(cyclic_prefix_length=16)
    demod = OFDMDemodulator(fft_size=64, l_min=0,
                            cyclic_prefix_length=16)
    x = QAMSource(4)([2, 14, 64])
    x_time = mod(x)
    assert x_time.shape == (2, 14 * 80)
    x_hat = demod(x_time)
    np.testing.assert_allclose(np.asarray(x_hat), np.asarray(x),
                               rtol=1e-3, atol=1e-4)


def test_ofdm_mod_demod_per_symbol_cp():
    cps = np.array([20] + [16] * 13)
    mod = OFDMModulator(cyclic_prefix_length=cps)
    demod = OFDMDemodulator(fft_size=64, l_min=0,
                            cyclic_prefix_length=cps)
    x = QAMSource(2)([3, 14, 64])
    x_time = mod(x)
    assert x_time.shape == (3, 14 * 64 + int(cps.sum()))
    x_hat = demod(x_time)
    np.testing.assert_allclose(np.asarray(x_hat), np.asarray(x),
                               rtol=1e-3, atol=1e-4)


def test_ofdm_demod_phase_compensation():
    # a pure delay of the time signal is undone by l_min compensation
    mod = OFDMModulator(cyclic_prefix_length=16)
    x = QAMSource(2)([1, 4, 64])
    x_time = np.asarray(mod(x))
    l_min = -2
    delayed = np.roll(x_time, -l_min, axis=-1)  # delay by 2 samples
    demod = OFDMDemodulator(fft_size=64, l_min=l_min,
                            cyclic_prefix_length=16)
    x_hat = np.asarray(demod(jnp.asarray(delayed)))
    np.testing.assert_allclose(x_hat[:, 1:3], np.asarray(x)[:, 1:3],
                               rtol=1e-2, atol=1e-2)


def test_empty_pilot_pattern():
    rg = make_rg(pilot_pattern="empty", pilot_ofdm_symbol_indices=None)
    assert rg.num_pilot_symbols == 0
    assert rg.num_data_symbols == 56 * 14


def test_ebnodb2no_with_resource_grid():
    from sionna_tpu.phy.utils import ebnodb2no
    rg = make_rg()
    no = float(ebnodb2no(10.0, 4, 0.5, rg))
    assert no > 0


def test_lmmse_interpolator_1d():
    from sionna_tpu.phy.ofdm import LMMSEInterpolator1D
    M, N = 8, 3
    rho = 0.95
    r = (rho ** np.abs(np.subtract.outer(np.arange(M), np.arange(M)))
         ).astype(np.complex64)
    mask = np.zeros((1, 1, N, M), int)
    mask[..., ::3] = 1
    interp = LMMSEInterpolator1D(mask, r, last_step=True)
    h_true = np.ones((2, 1, 1, 1, 1, N, M), np.complex64)
    err0 = np.full(h_true.shape, 1e-4, np.float32)
    h_in = np.where(mask[None, None, None] == 1, h_true, 0.)
    h_out, err_out = interp(jnp.asarray(h_in), jnp.asarray(err0))
    h_out, err_out = np.asarray(h_out), np.asarray(err_out)
    # pilots recovered exactly; high correlation -> interpolated close
    np.testing.assert_allclose(np.abs(h_out[..., ::3]), 1., atol=1e-3)
    assert np.all(np.abs(h_out[..., 1]) > 0.9)
    # error grows away from pilots
    assert err_out[0, 0, 0, 0, 0, 0, 1] > err_out[0, 0, 0, 0, 0, 0, 0]
    # intermediate-step variant runs and rescales
    interp2 = LMMSEInterpolator1D(mask, r, last_step=False)
    h2, e2 = interp2(jnp.asarray(h_in), jnp.asarray(err0))
    assert np.all(np.isfinite(np.asarray(h2).real))


def test_spatial_channel_filter():
    from sionna_tpu.phy.ofdm import SpatialChannelFilter
    rng = np.random.default_rng(3)
    # strongly correlated spatial covariance
    v = rng.normal(size=(4, 1)) + 1j * rng.normal(size=(4, 1))
    r = (v @ v.conj().T + 0.05 * np.eye(4)).astype(np.complex64)
    filt = SpatialChannelFilter(r, last_step=True)
    h_true = (v[:, 0] * (1. + 0j)).astype(np.complex64)
    noise = 0.3 * (rng.normal(size=(100, 1, 1, 1, 1, 1, 4))
                   + 1j * rng.normal(size=(100, 1, 1, 1, 1, 1, 4)))
    h_noisy = h_true + noise.astype(np.complex64)
    h_out, err = filt(jnp.asarray(h_noisy),
                      jnp.full(h_noisy.shape, 2 * 0.3 ** 2))
    mse_in = np.mean(np.abs(h_noisy - h_true) ** 2)
    mse_out = np.mean(np.abs(np.asarray(h_out) - h_true) ** 2)
    assert mse_out < 0.5 * mse_in  # smoothing reduces error
