"""Statistical and analytical tests for TR 38.901 models (modeled on
reference test/unit/channel/test_3gpp_channel_* strategy)."""

import numpy as np
import pytest
from scipy.special import j0

import jax
import jax.numpy as jnp

from sionna_tpu.phy import config
from sionna_tpu.phy.channel.tr38901 import (
    TDL, CDL, Antenna, AntennaArray, PanelArray, AntennaElement)
from sionna_tpu.phy.constants import PI, SPEED_OF_LIGHT


def omni_antenna():
    return Antenna(polarization="single", polarization_type="V",
                   antenna_pattern="omni", carrier_frequency=3.5e9)


# ----------------------------------------------------------------------
# Antenna
# ----------------------------------------------------------------------
def test_38901_element_pattern():
    el = AntennaElement("38.901")
    # boresight (theta=90deg, phi=0): max gain 8 dBi
    g = float(el.radiation_pattern(PI / 2, 0.0))
    assert 10 * np.log10(g) == pytest.approx(8.0, abs=1e-3)
    # 65 deg off in azimuth: -3 dB point at phi_3db/2... check
    # attenuation formula at phi = 65 deg: 12*(65/65)^2 = 12 dB down
    g2 = float(el.radiation_pattern(PI / 2, 65 / 180 * PI))
    assert 10 * np.log10(g2) == pytest.approx(8.0 - 12.0, abs=1e-2)
    # deep side: capped at -30 dB relative
    g3 = float(el.radiation_pattern(PI / 2, PI))
    assert 10 * np.log10(g3) == pytest.approx(8.0 - 30.0, abs=1e-2)


def test_panel_array_positions():
    arr = AntennaArray(num_rows=2, num_cols=4, polarization="single",
                       polarization_type="V", antenna_pattern="omni",
                       carrier_frequency=3e9)
    lam = SPEED_OF_LIGHT / 3e9
    pos = arr.ant_pos
    assert pos.shape == (8, 3)
    # y-spacing is half a wavelength
    ys = np.unique(np.round(pos[:, 1], 9))
    np.testing.assert_allclose(np.diff(ys), lam / 2, rtol=1e-6)
    # centered
    np.testing.assert_allclose(pos.mean(0), 0, atol=1e-12)


def test_dual_polarization_array():
    arr = AntennaArray(num_rows=1, num_cols=2, polarization="dual",
                       polarization_type="cross",
                       antenna_pattern="38.901",
                       carrier_frequency=3e9)
    assert arr.num_ant == 4
    assert len(arr.ant_ind_pol1) == 2
    assert len(arr.ant_ind_pol2) == 2
    # co-located pairs
    np.testing.assert_allclose(arr.ant_pos_pol1, arr.ant_pos_pol2)


# ----------------------------------------------------------------------
# TDL
# ----------------------------------------------------------------------
def test_tdl_power_normalization():
    for model in ("A", "C", "D"):
        tdl = TDL(model, 100e-9, 3.5e9)
        a, tau = tdl(1000, 1, 15e3 * 14, key=jax.random.PRNGKey(2))
        p = float(jnp.mean(jnp.sum(jnp.abs(a[..., 0]) ** 2, axis=-1)))
        assert p == pytest.approx(1.0, rel=0.05), model


def test_tdl_delay_spread_scaling():
    ds = 250e-9
    tdl = TDL("B", ds, 3.5e9)
    a, tau = tdl(500, 1, 15e3, key=jax.random.PRNGKey(0))
    tau = np.asarray(tau)[0, 0, 0]
    p = np.asarray(tdl.mean_powers)
    mean_delay = np.sum(p * tau) / p.sum()
    rms = np.sqrt(np.sum(p * (tau - mean_delay) ** 2) / p.sum())
    assert rms == pytest.approx(ds, rel=1e-3)


def test_tdl_doppler_autocorrelation():
    # Clarke's model: R(dt) = J0(2 pi fd dt)
    speed = 30.0
    fc = 3.5e9
    fd = speed / SPEED_OF_LIGHT * fc
    fs = 10000.0
    tdl = TDL("A", 100e-9, fc, min_speed=speed, max_speed=speed,
              num_sinusoids=40)
    a, _ = tdl(2000, 64, fs, key=jax.random.PRNGKey(3))
    a = np.asarray(a)[:, 0, 0, 0, 0, :, :]  # [batch, taps, time]
    # normalized time autocorrelation vs lag, averaged over taps/batch
    lags = np.arange(16)
    ac = []
    for lag in lags:
        x1 = a[..., :64 - lag]
        x2 = a[..., lag:]
        ac.append(np.mean(x1 * np.conj(x2)).real
                  / np.mean(np.abs(x1) ** 2))
    ac = np.array(ac)
    expected = j0(2 * PI * fd * lags / fs)
    np.testing.assert_allclose(ac, expected, atol=0.06)


def test_tdl_los_k_factor():
    tdl = TDL("D", 100e-9, 3.5e9)
    assert tdl.los
    k = float(tdl.k_factor)
    # TDL-D spec K-factor is 13.3 dB relative to first tap
    assert 10 * np.log10(k) == pytest.approx(13.3, abs=0.2)


# ----------------------------------------------------------------------
# CDL
# ----------------------------------------------------------------------
def test_cdl_omni_power_unit():
    ant = omni_antenna()
    cdl = CDL("B", 100e-9, 3.5e9, ant, ant, "uplink")
    a, tau = cdl(256, 1, 15e3, key=jax.random.PRNGKey(4))
    p = float(jnp.mean(jnp.sum(jnp.abs(a[..., 0]) ** 2, axis=-1)))
    assert p == pytest.approx(1.0, rel=0.1)


def test_cdl_delay_spread():
    ant = omni_antenna()
    ds = 300e-9
    cdl = CDL("C", ds, 3.5e9, ant, ant, "downlink")
    tau = np.asarray(cdl.delays)
    p = np.asarray(cdl.powers)
    mean_delay = np.sum(p * tau)
    rms = np.sqrt(np.sum(p * (tau - mean_delay) ** 2))
    assert rms == pytest.approx(ds, rel=1e-2)


def test_cdl_los_components():
    ant = omni_antenna()
    cdl = CDL("D", 100e-9, 3.5e9, ant, ant, "downlink")
    assert cdl.los
    assert float(cdl.k_factor) > 1
    a, tau = cdl(64, 1, 15e3, key=jax.random.PRNGKey(5))
    # first tap carries the dominant (specular) power
    powers = np.mean(np.abs(np.asarray(a)[..., 0]) ** 2, axis=(0, 1, 2,
                                                               3, 4))
    assert powers[0] == pytest.approx(powers.max())


def test_cdl_ula_array_response():
    # Narrow-beam check: with a ULA on the BS and a single dominant LoS
    # path (CDL-D K-factor >> 1), the phase difference between adjacent
    # BS antennas matches the LoS geometry.
    bs = AntennaArray(num_rows=1, num_cols=4, polarization="single",
                      polarization_type="V", antenna_pattern="omni",
                      carrier_frequency=3.5e9)
    ut = omni_antenna()
    cdl = CDL("D", 10e-9, 3.5e9, ut, bs, "uplink")
    a, tau = cdl(128, 1, 15e3, key=jax.random.PRNGKey(6))
    a = np.asarray(a)[:, 0, :, 0, 0, 0, 0]  # [batch, rx_ant], first tap
    phase_diff = np.angle(np.mean(a[:, 1:] * np.conj(a[:, :-1]),
                                  axis=0))
    # all adjacent pairs should show the same phase progression
    assert np.std(phase_diff) < 0.15
    # and it should match the LoS AoA geometry: the los zenith/azimuth
    lam = SPEED_OF_LIGHT / 3.5e9
    zoa = float(cdl._los_zoa[0, 0, 0])
    aoa = float(cdl._los_aoa[0, 0, 0])
    expected = 2 * PI / lam * (lam / 2) * np.sin(zoa) * np.sin(aoa)
    # wrap to [-pi, pi]
    expected = np.angle(np.exp(1j * expected))
    assert phase_diff.mean() == pytest.approx(expected, abs=0.2)


def test_cdl_direction_symmetry():
    # uplink and downlink swap departure/arrival angle sets
    ant = omni_antenna()
    ul = CDL("A", 100e-9, 3.5e9, ant, ant, "uplink")
    dl = CDL("A", 100e-9, 3.5e9, ant, ant, "downlink")
    np.testing.assert_allclose(np.asarray(ul._aoa), np.asarray(dl._aod))
    np.testing.assert_allclose(np.asarray(ul._zod), np.asarray(dl._zoa))


def test_cdl_with_ofdm_channel():
    from sionna_tpu.phy.ofdm import ResourceGrid
    from sionna_tpu.phy.channel import OFDMChannel
    from sionna_tpu.phy.mapping import QAMSource
    bs = AntennaArray(num_rows=1, num_cols=2, polarization="single",
                      polarization_type="V", antenna_pattern="omni",
                      carrier_frequency=3.5e9)
    ut = omni_antenna()
    cdl = CDL("C", 100e-9, 3.5e9, ut, bs, "uplink")
    rg = ResourceGrid(num_ofdm_symbols=2, fft_size=32,
                      subcarrier_spacing=30e3)
    ch = OFDMChannel(cdl, rg, return_channel=True)
    x = QAMSource(2)([4, 1, 1, 2, 32])
    y, h = ch(x, no=0.01, key=jax.random.PRNGKey(7))
    assert y.shape == (4, 1, 2, 2, 32)
    assert h.shape == (4, 1, 2, 1, 1, 2, 32)
