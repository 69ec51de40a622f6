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
           "one_ring_corr_mat", "drop_uts_in_sector",
           "set_3gpp_scenario_parameters", "relocate_uts",
           "generate_uts_topology", "random_ut_properties",
           "gen_single_sector_topology",
           "gen_single_sector_topology_interferers"]


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


# ----------------------------------------------------------------------
# 3GPP system-level topology helpers (reference utils.py:511-1486).
# Topology generation is host-side bookkeeping that happens once per
# drop, so these use NumPy + the host RNG and return NumPy arrays that
# feed directly into SystemLevelScenario.set_topology.
# ----------------------------------------------------------------------

def _np_rdtype(precision):
    return np.float64 if (precision or config.precision) == "double" \
        else np.float32


def drop_uts_in_sector(batch_size, num_ut, min_bs_ut_dist, isd,
                       bs_height=0., ut_height=0., precision=None):
    """Uniformly samples UT locations within a 120-deg cell sector
    centered on a BS at the origin (reference utils.py:511).

    Returns [batch_size, num_ut, 2] X-Y locations."""
    rdtype = _np_rdtype(precision)
    rng = config.np_rng
    d_min = max(float(min_bs_ut_dist), abs(float(bs_height)
                                           - float(ut_height)))
    r = 0.5 * float(isd)
    r_min2 = d_min ** 2 - (float(bs_height) - float(ut_height)) ** 2

    alpha_half = rng.uniform(-PI / 6., PI / 6., (batch_size, num_ut))
    r_max = r / np.cos(alpha_half)
    # Uniform area density: sample squared distance uniformly
    distance = np.sqrt(rng.uniform(size=(batch_size, num_ut))
                       * (r_max ** 2 - r_min2) + r_min2)
    side = rng.integers(0, 2, (batch_size, num_ut)) * 2. + 1.
    alpha = alpha_half + side * PI / 6.
    return np.stack([distance * np.cos(alpha),
                     distance * np.sin(alpha)],
                    axis=-1).astype(rdtype)


def set_3gpp_scenario_parameters(scenario, min_bs_ut_dist=None,
                                 isd=None, bs_height=None,
                                 min_ut_height=None, max_ut_height=None,
                                 indoor_probability=None,
                                 min_ut_velocity=None,
                                 max_ut_velocity=None, precision=None):
    """Default drop parameters for the 3GPP system-level scenarios
    (reference utils.py:621)."""
    defaults = {
        "umi": (10., 200., 10., 1.5, 1.5, 0.8, 0.0, 0.0),
        "umi-calibration": (0., 200., 10., 1.5, 1.5, 0.8,
                            3. / 3.6, 3. / 3.6),
        "uma": (35., 500., 25., 1.5, 1.5, 0.8, 0.0, 0.0),
        "uma-calibration": (0., 500., 25., 1.5, 1.5, 0.8,
                            3. / 3.6, 3. / 3.6),
        "rma": (35., 5000., 35., 1.5, 1.5, 0.5, 0.0, 0.0),
    }
    if scenario not in defaults:
        raise ValueError(
            "`scenario` must be one of 'umi', 'uma', 'rma', "
            "'umi-calibration', 'uma-calibration'")
    d = defaults[scenario]
    vals = [min_bs_ut_dist, isd, bs_height, min_ut_height,
            max_ut_height, indoor_probability, min_ut_velocity,
            max_ut_velocity]
    return tuple(float(d[i]) if v is None else float(v)
                 for i, v in enumerate(vals))


def relocate_uts(ut_loc, sector_id, cell_loc):
    """Rotates UTs (assumed dropped in sector 0 of the origin cell)
    into ``sector_id`` and translates them to ``cell_loc``
    (reference utils.py:785)."""
    ut_loc = np.asarray(ut_loc)
    sector_id = np.asarray(sector_id, ut_loc.dtype)
    while sector_id.ndim < 2:
        sector_id = sector_id[None]
    cell_loc = np.asarray(cell_loc, ut_loc.dtype)
    while cell_loc.ndim < ut_loc.ndim:
        cell_loc = cell_loc[None]

    angle = sector_id * 2. * PI / 3.0
    rot = np.stack([np.cos(angle), -np.sin(angle),
                    np.sin(angle), np.cos(angle)], axis=-1)
    rot = rot.reshape(angle.shape + (2, 2))
    ut_loc_rot = np.squeeze(rot @ ut_loc[..., None], axis=-1)
    return ut_loc_rot + cell_loc


def random_ut_properties(batch_size, num_ut, indoor_probability,
                         min_ut_velocity, max_ut_velocity,
                         precision=None):
    """Random UT orientations, planar velocities and indoor states
    (reference utils.py:986)."""
    rdtype = _np_rdtype(precision)
    rng = config.np_rng
    in_state = rng.uniform(size=(batch_size, num_ut)) \
        < float(indoor_probability)

    vel_angle = rng.uniform(-PI, PI, (batch_size, num_ut))
    vel_norm = rng.uniform(float(min_ut_velocity),
                           float(max_ut_velocity) + 1e-12,
                           (batch_size, num_ut))
    ut_velocities = np.stack(
        [vel_norm * np.cos(vel_angle), vel_norm * np.sin(vel_angle),
         np.zeros((batch_size, num_ut))], axis=-1).astype(rdtype)

    ut_orientations = rng.uniform(
        -0.5 * PI, 0.5 * PI, (batch_size, num_ut, 3)).astype(rdtype)
    return ut_orientations, ut_velocities, in_state


def generate_uts_topology(batch_size, num_ut, drop_area, cell_loc_xy,
                          min_bs_ut_dist, isd, min_ut_height,
                          max_ut_height, indoor_probability,
                          min_ut_velocity, max_ut_velocity,
                          precision=None):
    """Samples UT locations from a sector or a whole cell
    (reference utils.py:861)."""
    if drop_area not in ("sector", "cell"):
        raise ValueError("drop_area must be 'sector' or 'cell'")
    rdtype = _np_rdtype(precision)
    rng = config.np_rng

    ut_loc_xy = drop_uts_in_sector(batch_size, num_ut, min_bs_ut_dist,
                                   isd, precision=precision)
    if drop_area == "sector":
        sectors = np.zeros((batch_size, num_ut), np.int32)
    else:
        sectors = rng.integers(0, 3, (batch_size, num_ut))
    ut_loc_xy = relocate_uts(ut_loc_xy, sectors, cell_loc_xy)

    ut_loc_z = rng.uniform(float(min_ut_height),
                           float(max_ut_height) + 1e-12,
                           (batch_size, num_ut, 1))
    ut_loc = np.concatenate([ut_loc_xy, ut_loc_z],
                            axis=-1).astype(rdtype)

    ut_orientations, ut_velocities, in_state = random_ut_properties(
        batch_size, num_ut, indoor_probability, min_ut_velocity,
        max_ut_velocity, precision)
    return ut_loc, ut_orientations, ut_velocities, in_state


def _single_sector_bs(batch_size, min_bs_ut_dist, isd, bs_height,
                      rdtype):
    """BS at the origin, downtilted towards the sector center."""
    bs_loc = np.zeros((batch_size, 1, 3), rdtype)
    bs_loc[:, :, 2] = bs_height
    sector_center = (min_bs_ut_dist + 0.5 * isd) * 0.5
    bs_downtilt = 0.5 * PI - np.arctan(sector_center / bs_height)
    bs_orientation = np.zeros((batch_size, 1, 3), rdtype)
    bs_orientation[:, :, 0] = PI / 3.0
    bs_orientation[:, :, 1] = bs_downtilt
    return bs_loc, bs_orientation


def gen_single_sector_topology(batch_size, num_ut, scenario,
                               min_bs_ut_dist=None, isd=None,
                               bs_height=None, min_ut_height=None,
                               max_ut_height=None,
                               indoor_probability=None,
                               min_ut_velocity=None,
                               max_ut_velocity=None, precision=None):
    """Single-BS, single-sector topology drop
    (reference utils.py:1068).  Returns (ut_loc, bs_loc,
    ut_orientations, bs_orientations, ut_velocities, in_state) ready
    for ``set_topology``."""
    (min_bs_ut_dist, isd, bs_height, min_ut_height, max_ut_height,
     indoor_probability, min_ut_velocity, max_ut_velocity) = \
        set_3gpp_scenario_parameters(
            scenario, min_bs_ut_dist, isd, bs_height, min_ut_height,
            max_ut_height, indoor_probability, min_ut_velocity,
            max_ut_velocity, precision)
    rdtype = _np_rdtype(precision)
    bs_loc, bs_orientation = _single_sector_bs(
        batch_size, min_bs_ut_dist, isd, bs_height, rdtype)
    ut_loc, ut_orientations, ut_velocities, in_state = \
        generate_uts_topology(
            batch_size, num_ut, "sector", np.zeros(2, rdtype),
            min_bs_ut_dist, isd, min_ut_height, max_ut_height,
            indoor_probability, min_ut_velocity, max_ut_velocity,
            precision)
    return (ut_loc, bs_loc, ut_orientations, bs_orientation,
            ut_velocities, in_state)


def gen_single_sector_topology_interferers(
        batch_size, num_ut, num_interferer, scenario,
        min_bs_ut_dist=None, isd=None, bs_height=None,
        min_ut_height=None, max_ut_height=None,
        indoor_probability=None, min_ut_velocity=None,
        max_ut_velocity=None, precision=None):
    """Single-sector topology plus ``num_interferer`` UTs dropped in
    the two adjacent cells (reference utils.py:1252).  The first
    ``num_ut`` UTs along axis 1 are the served ones."""
    (min_bs_ut_dist, isd, bs_height, min_ut_height, max_ut_height,
     indoor_probability, min_ut_velocity, max_ut_velocity) = \
        set_3gpp_scenario_parameters(
            scenario, min_bs_ut_dist, isd, bs_height, min_ut_height,
            max_ut_height, indoor_probability, min_ut_velocity,
            max_ut_velocity, precision)
    rdtype = _np_rdtype(precision)
    rng = config.np_rng
    bs_loc, bs_orientation = _single_sector_bs(
        batch_size, min_bs_ut_dist, isd, bs_height, rdtype)

    ut_loc, ut_orientations, ut_velocities, in_state = \
        generate_uts_topology(
            batch_size, num_ut, "sector", np.zeros(2, rdtype),
            min_bs_ut_dist, isd, min_ut_height, max_ut_height,
            indoor_probability, min_ut_velocity, max_ut_velocity,
            precision)

    # Interferers dropped in one of the two adjacent cells
    inter_cell_center = np.array(
        [[0.0, isd],
         [isd * np.cos(PI / 6.0), isd * np.sin(PI / 6.0)]], rdtype)
    cell_index = rng.integers(0, 2, (batch_size, num_interferer))
    inter_cells = inter_cell_center[cell_index]

    inter_loc, inter_orientations, inter_velocities, inter_in_state = \
        generate_uts_topology(
            batch_size, num_interferer, "cell", inter_cells,
            min_bs_ut_dist, isd, min_ut_height, max_ut_height,
            indoor_probability, min_ut_velocity, max_ut_velocity,
            precision)

    ut_loc = np.concatenate([ut_loc, inter_loc], axis=1)
    ut_orientations = np.concatenate(
        [ut_orientations, inter_orientations], axis=1)
    ut_velocities = np.concatenate(
        [ut_velocities, inter_velocities], axis=1)
    in_state = np.concatenate([in_state, inter_in_state], axis=1)
    return (ut_loc, bs_loc, ut_orientations, bs_orientation,
            ut_velocities, in_state)
