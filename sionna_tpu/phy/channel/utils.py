"""Channel utility functions (reference:
src/sionna/phy/channel/utils.py; fresh JAX implementations).

The CIR->OFDM conversion is the hot path for stochastic channels: a
single fused exp/multiply/reduce over
[batch, rx, rxa, tx, txa, paths, time, freq] that XLA maps to VPU
work; keep ``a`` in the canonical layout and let the compiler fuse.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..config import config, dtypes
from ..constants import PI
from ..utils.tensors import expand_to_rank

__all__ = ["subcarrier_frequencies", "time_frequency_vector",
           "time_lag_discrete_time_channel", "cir_to_ofdm_channel",
           "cir_to_time_channel", "time_to_ofdm_channel", "deg_2_rad",
           "rad_2_deg", "wrap_angle_0_360", "exp_corr_mat",
           "one_ring_corr_mat"]


def subcarrier_frequencies(num_subcarriers, subcarrier_spacing,
                           precision=None):
    """Baseband subcarrier frequencies, DC-centered
    (reference utils.py:15)."""
    rdtype = config.rdtype if precision is None \
        else dtypes[precision]["jax"]["rdtype"]
    start = -(num_subcarriers // 2)
    limit = num_subcarriers // 2 + (num_subcarriers % 2)
    freqs = jnp.arange(start, limit, dtype=rdtype)
    return freqs * subcarrier_spacing


def time_frequency_vector(num_samples, sample_duration, precision=None):
    """Time and frequency vectors (reference utils.py:66)."""
    rdtype = config.rdtype if precision is None \
        else dtypes[precision]["jax"]["rdtype"]
    num_samples = int(num_samples)
    n_min = num_samples // 2
    n_max = num_samples - n_min - 1
    t = jnp.linspace(-n_min, n_max, num_samples).astype(rdtype) \
        * sample_duration
    f = jnp.linspace(-n_min, n_max, num_samples).astype(rdtype) \
        * 1 / (sample_duration * num_samples)
    return t, f


def time_lag_discrete_time_channel(bandwidth, maximum_delay_spread=3e-6):
    """Recommended (l_min, l_max) for the discrete-time channel
    (reference utils.py:123)."""
    l_min = -6
    l_max = int(np.ceil(maximum_delay_spread * bandwidth) + 6)
    return l_min, l_max


def cir_to_ofdm_channel(frequencies, a, tau, normalize=False):
    """Channel frequency response h(f) = sum_m a_m exp(-j2 pi f tau_m)
    (reference utils.py:180).

    a: [b, rx, rxa, tx, txa, paths, T]; tau: [b, rx, tx, paths] or
    [b, rx, rxa, tx, txa, paths]. Returns
    [b, rx, rxa, tx, txa, T, fft_size].
    """
    a = jnp.asarray(a)
    tau = jnp.asarray(tau)
    real_dtype = tau.dtype
    cdtype = a.dtype

    if tau.ndim == 4:
        tau = tau[:, :, None, :, None, :]
    # [b, rx, rxa, tx, txa, paths, 1, 1] for (time, freq) broadcast
    tau = tau[..., None, None]
    h = a[..., None]  # [..., paths, T, 1]
    freqs = expand_to_rank(jnp.asarray(frequencies, real_dtype),
                           tau.ndim, axis=0)
    e = jnp.exp(jnp.asarray(-1j, cdtype)
                * (2 * PI * freqs * tau).astype(real_dtype)
                .astype(cdtype))
    h_f = jnp.sum(h * e, axis=-3)  # sum over paths

    if normalize:
        c = jnp.mean(jnp.abs(h_f) ** 2, axis=(2, 4, 5, 6),
                     keepdims=True)
        c = jnp.sqrt(c).astype(cdtype)
        h_f = jnp.where(c == 0, jnp.zeros_like(h_f), h_f / c)
    return h_f


def cir_to_time_channel(bandwidth, a, tau, l_min, l_max,
                        normalize=False):
    """Discrete-time channel taps assuming sinc pulse shaping
    (reference utils.py:256). Returns
    [b, rx, rxa, tx, txa, T, l_max - l_min + 1].
    """
    a = jnp.asarray(a)
    tau = jnp.asarray(tau)
    real_dtype = tau.dtype
    cdtype = a.dtype

    if tau.ndim == 4:
        tau = tau[:, :, None, :, None, :]
    tau = tau[..., None, None]  # [..., paths, 1, 1]
    h = a[..., None]
    l = jnp.arange(l_min, l_max + 1, dtype=real_dtype)
    l = expand_to_rank(l, tau.ndim, axis=0)
    sinc = jnp.sinc(l - bandwidth * tau).astype(cdtype)
    hm = jnp.sum(h * sinc, axis=-3)  # sum over paths

    if normalize:
        c = jnp.mean(jnp.sum(jnp.abs(hm) ** 2, axis=-1),
                     axis=(2, 4, 5), keepdims=True)[..., None]
        c = jnp.sqrt(c).astype(cdtype)
        hm = jnp.where(c == 0, jnp.zeros_like(hm), hm / c)
    return hm


def time_to_ofdm_channel(h_t, rg, l_min):
    """Frequency response per OFDM symbol from discrete-time taps
    (reference utils.py:352)."""
    h_t = jnp.asarray(h_t)
    fft_size = rg.fft_size
    num_ofdm_symbols = rg.num_ofdm_symbols
    cp = rg.cyclic_prefix_length
    # keep only time steps at the start of each OFDM symbol (after CP)
    sym_len = fft_size + cp
    start_idx = cp + sym_len * np.arange(num_ofdm_symbols)
    start_idx = start_idx[start_idx < h_t.shape[-2]]
    h = jnp.take(h_t, jnp.asarray(start_idx, jnp.int32), axis=-2)
    # zero-pad taps to fft_size with correct placement of negative lags
    l_tot = h.shape[-1]
    l_max = l_min + l_tot - 1
    h_pad = jnp.zeros(h.shape[:-1] + (fft_size,), h.dtype)
    # taps for lags 0..l_max at positions 0..l_max
    h_pad = h_pad.at[..., :l_max + 1].set(h[..., -l_min:])
    # taps for lags l_min..-1 wrap to positions N+l_min..N-1
    h_pad = h_pad.at[..., fft_size + l_min:].set(h[..., :-l_min])
    h_f = jnp.fft.fft(h_pad, axis=-1)
    return jnp.fft.fftshift(h_f, axes=-1)


def deg_2_rad(x):
    """Degrees to radians (reference utils.py:460)."""
    x = jnp.asarray(x)
    return x * jnp.asarray(PI / 180.0, x.dtype)


def rad_2_deg(x):
    """Radians to degrees (reference utils.py:477)."""
    x = jnp.asarray(x)
    return x * jnp.asarray(180.0 / PI, x.dtype)


def wrap_angle_0_360(angle):
    """Wraps angles in degrees to [0, 360) (reference utils.py:494)."""
    return jnp.mod(jnp.asarray(angle), 360.)


def exp_corr_mat(a, n, precision=None):
    """Exponential correlation matrix R[i,j] = a^|i-j| (conj below
    diagonal) (reference utils.py:1489)."""
    cdtype = config.cdtype if precision is None \
        else dtypes[precision]["jax"]["cdtype"]
    a = jnp.asarray(a, cdtype)
    if a.ndim == 0:
        a = a[None]
    i = jnp.arange(n)
    d = i[:, None] - i[None, :]  # i - j
    mag = jnp.abs(a)[..., None, None]
    phase = jnp.angle(a)[..., None, None]
    dd = jnp.abs(d).astype(mag.dtype)
    r = (mag ** dd) * jnp.exp(
        1j * phase.astype(mag.dtype) * d.astype(mag.dtype)).astype(cdtype)
    return r.squeeze(0) if r.shape[0] == 1 and np.ndim(a) == 1 \
        and a.shape[0] == 1 else r


def one_ring_corr_mat(phi_deg, num_ant, d_h=0.5, sigma_phi_deg=15,
                      precision=None):
    """One-ring correlation matrix for a ULA
    (reference utils.py:1562)."""
    rdtype = config.rdtype if precision is None \
        else dtypes[precision]["jax"]["rdtype"]
    cdtype = config.cdtype if precision is None \
        else dtypes[precision]["jax"]["cdtype"]
    phi = deg_2_rad(jnp.asarray(phi_deg, rdtype))
    sigma_phi = deg_2_rad(jnp.asarray(sigma_phi_deg, rdtype))
    if phi.ndim == 0:
        phi = phi[None]
    i = jnp.arange(num_ant)
    d = (i[:, None] - i[None, :]).astype(rdtype)  # antenna offsets
    c = 2 * PI * d_h * d
    phi_e = phi[..., None, None]
    arg = c * jnp.sin(phi_e)
    # small-angle expansion (Gaussian local scattering model)
    exp_arg = 1j * arg - 0.5 * (sigma_phi ** 2) \
        * (c * jnp.cos(phi_e)) ** 2
    r = jnp.exp(exp_arg).astype(cdtype)
    return r.squeeze(0) if np.ndim(phi_deg) == 0 else r
