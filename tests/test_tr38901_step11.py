"""TR 38.901 step-11 statistical/structural validation against
independent NumPy oracles (mirrors the reference's strategy in
test/unit/channel/test_3gpp_channel_channel_coefficients.py: every
factor of (7.5-22)/(7.5-28..30) is re-derived from the spec equations
with explicit loops/elementary matrices and compared to the vectorized
JAX implementation)."""

import numpy as np
import pytest

import jax

from sionna_tpu.phy.channel.tr38901 import (
    PanelArray, RMaScenario, LSPGenerator, RaysGenerator)
from sionna_tpu.phy.channel.tr38901.channel_coefficients import (
    Topology, ChannelCoefficientsGenerator)
from sionna_tpu.phy.constants import SPEED_OF_LIGHT

FC = 3.5e9
MAX_ERR = 1e-6      # double precision: the implementations must agree
                    # to numerical accuracy, not just statistically


# --------------------------------------------------------------- #
# NumPy oracles built from elementary operations
# --------------------------------------------------------------- #

def rot_matrix_oracle(orient):
    """(7.1-4) as a product of elementary rotations
    R_z(alpha) R_y(beta) R_x(gamma)."""
    a, b, c = orient
    rz = np.array([[np.cos(a), -np.sin(a), 0.],
                   [np.sin(a), np.cos(a), 0.],
                   [0., 0., 1.]])
    ry = np.array([[np.cos(b), 0., np.sin(b)],
                   [0., 1., 0.],
                   [-np.sin(b), 0., np.cos(b)]])
    rx = np.array([[1., 0., 0.],
                   [0., np.cos(c), -np.sin(c)],
                   [0., np.sin(c), np.cos(c)]])
    return rz @ ry @ rx


def sph_unit_vectors(theta, phi):
    """Global spherical basis (rho_hat, theta_hat, phi_hat)."""
    st, ct = np.sin(theta), np.cos(theta)
    sp, cp = np.sin(phi), np.cos(phi)
    rho = np.array([st * cp, st * sp, ct])
    th = np.array([ct * cp, ct * sp, -st])
    ph = np.array([-sp, cp, 0.])
    return rho, th, ph


def max_rel_err(ref, x):
    err = np.abs(ref - x)
    return np.max(np.where(np.abs(ref) > 0.,
                           err / (np.abs(ref) + 1e-10), err))


# --------------------------------------------------------------- #
# Fixture: small RMa drop with rays and debug outputs
# --------------------------------------------------------------- #

@pytest.fixture(scope="module")
def ctx():
    batch, nb_ut, nb_bs, num_t = 2, 3, 2, 8
    fs = 20e6
    bs_array = PanelArray(num_rows_per_panel=2, num_cols_per_panel=2,
                          polarization="dual", polarization_type="VH",
                          antenna_pattern="38.901",
                          carrier_frequency=FC, precision="double")
    ut_array = PanelArray(num_rows_per_panel=1, num_cols_per_panel=1,
                          polarization="dual", polarization_type="VH",
                          antenna_pattern="38.901",
                          carrier_frequency=FC, precision="double")
    sc = RMaScenario(FC, ut_array, bs_array, "downlink",
                     precision="double")
    rng = np.random.default_rng(4)
    ut_loc = np.stack([rng.uniform(100, 2000, (batch, nb_ut)),
                       rng.uniform(100, 2000, (batch, nb_ut)),
                       np.full((batch, nb_ut), 1.5)], axis=-1)
    bs_loc = np.stack([rng.uniform(0, 100, (batch, nb_bs)),
                       rng.uniform(0, 100, (batch, nb_bs)),
                       np.full((batch, nb_bs), 10.)], axis=-1)
    ut_orient = rng.uniform(0, 2 * np.pi, (batch, nb_ut, 3))
    bs_orient = rng.uniform(0, 2 * np.pi, (batch, nb_bs, 3))
    ut_vel = rng.uniform(0., 5., (batch, nb_ut, 3))
    in_state = rng.random((batch, nb_ut)) < 0.5
    sc.set_topology(ut_loc, bs_loc, ut_orient, bs_orient, ut_vel,
                    in_state)

    lsp_gen = LSPGenerator(sc)
    lsp_gen.topology_updated_callback()
    ray_gen = RaysGenerator(sc)
    ray_gen.topology_updated_callback()
    lsp = lsp_gen(key=jax.random.PRNGKey(10))
    rays = ray_gen(lsp, key=jax.random.PRNGKey(11))

    topology = Topology(
        velocities=np.float64(ut_vel), moving_end="rx",
        los_aoa=np.asarray(sc.los_aoa, np.float64),
        los_aod=np.asarray(sc.los_aod, np.float64),
        los_zoa=np.asarray(sc.los_zoa, np.float64),
        los_zod=np.asarray(sc.los_zod, np.float64),
        los=np.asarray(sc.los),
        distance_3d=np.asarray(sc.distance_3d, np.float64),
        tx_orientations=np.float64(bs_orient),
        rx_orientations=np.float64(ut_orient))

    ccg = ChannelCoefficientsGenerator(
        FC, tx_array=bs_array, rx_array=ut_array, subclustering=True,
        precision="double")
    c_ds = np.asarray(sc.get_param("cDS"), np.float64) * 1e-9
    h, delays, phi, t = ccg(num_t, fs, lsp.k_factor, rays, topology,
                            c_ds, debug=True,
                            key=jax.random.PRNGKey(12))
    return dict(ccg=ccg, rays=rays, lsp=lsp, topology=topology,
                phi=np.asarray(phi), t=np.asarray(t), h=np.asarray(h),
                delays=np.asarray(delays), c_ds=c_ds,
                bs_array=bs_array, ut_array=ut_array,
                lam=SPEED_OF_LIGHT / FC)


# --------------------------------------------------------------- #
# Geometry primitives
# --------------------------------------------------------------- #

def test_forward_rotation_matrix(ctx):
    rng = np.random.default_rng(0)
    orients = rng.uniform(0, 2 * np.pi, (20, 3))
    got = np.asarray(ctx["ccg"]._forward_rotation_matrix(orients))
    ref = np.stack([rot_matrix_oracle(o) for o in orients])
    assert max_rel_err(ref, got) < MAX_ERR


def test_unit_sphere_vector(ctx):
    rng = np.random.default_rng(1)
    theta = rng.uniform(0, np.pi, 50)
    phi = rng.uniform(-np.pi, np.pi, 50)
    got = np.asarray(
        ctx["ccg"]._unit_sphere_vector(theta, phi))[..., 0]
    ref = np.stack([sph_unit_vectors(t, p)[0]
                    for t, p in zip(theta, phi)])
    assert max_rel_err(ref, got) < MAX_ERR


def test_gcs_to_lcs(ctx):
    """LCS angles: rotating the unit vector by R^T and reading off
    spherical angles must reproduce (theta', phi')."""
    rng = np.random.default_rng(2)
    orients = rng.uniform(0, 2 * np.pi, (30, 3))
    theta = rng.uniform(0, np.pi, 30)
    phi = rng.uniform(-np.pi, np.pi, 30)
    tp, pp = ctx["ccg"]._gcs_to_lcs(orients, theta, phi)
    tp, pp = np.asarray(tp), np.asarray(pp)
    for i in range(30):
        rho = sph_unit_vectors(theta[i], phi[i])[0]
        v = rot_matrix_oracle(orients[i]).T @ rho
        assert abs(np.arccos(np.clip(v[2], -1, 1)) - tp[i]) < 1e-9
        assert abs(np.angle(v[0] + 1j * v[1]) - pp[i]) < 1e-9


def test_l2g_response_vector_identity(ctx):
    """(7.1-11): the GCS components must represent the SAME physical
    3D field vector: R (F'_th th_hat' + F'_ph ph_hat') projected on
    the global (th_hat, ph_hat) equals the returned components."""
    rng = np.random.default_rng(3)
    n = 40
    orients = rng.uniform(0, 2 * np.pi, (n, 3))
    theta = rng.uniform(0.1, np.pi - 0.1, n)
    phi = rng.uniform(-np.pi, np.pi, n)
    f_prime = rng.normal(size=(n, 2))
    got = np.asarray(ctx["ccg"]._l2g_response(
        f_prime, orients, theta, phi))[..., 0]    # [n, 2]
    tp, pp = ctx["ccg"]._gcs_to_lcs(orients, theta, phi)
    tp, pp = np.asarray(tp), np.asarray(pp)
    for i in range(n):
        r = rot_matrix_oracle(orients[i])
        _, thp_hat, php_hat = sph_unit_vectors(tp[i], pp[i])
        v_gcs = r @ (f_prime[i, 0] * thp_hat + f_prime[i, 1] * php_hat)
        _, th_hat, ph_hat = sph_unit_vectors(theta[i], phi[i])
        ref = np.array([th_hat @ v_gcs, ph_hat @ v_gcs])
        assert np.max(np.abs(ref - got[i])) < 1e-9


def test_antenna_positions_gcs(ctx):
    """d_bar (7.5-22): element positions rotated by the device
    orientation."""
    topo = ctx["topology"]
    got = np.asarray(ctx["ccg"]._tx_antenna_positions_gcs(topo))
    pos = np.asarray(ctx["bs_array"].ant_pos)
    tx_or = np.asarray(topo.tx_orientations)
    for b in range(got.shape[0]):
        for s in range(got.shape[1]):
            ref = pos @ rot_matrix_oracle(tx_or[b, s]).T
            assert max_rel_err(ref, got[b, s]) < MAX_ERR


# --------------------------------------------------------------- #
# Step-11 factors
# --------------------------------------------------------------- #

def test_phase_matrix(ctx):
    phi = ctx["phi"]
    xpr = np.asarray(ctx["rays"].xpr)
    got = np.asarray(ctx["ccg"]._step_11_phase_matrix(
        jax.numpy.asarray(phi), ctx["rays"]))
    k = np.sqrt(1. / xpr)
    ref = np.stack([
        np.stack([np.exp(1j * phi[..., 0]),
                  k * np.exp(1j * phi[..., 1])], -1),
        np.stack([k * np.exp(1j * phi[..., 2]),
                  np.exp(1j * phi[..., 3])], -1)], -2)
    assert max_rel_err(ref, got) < MAX_ERR


def test_doppler_matrix(ctx):
    rays, topo, t = ctx["rays"], ctx["topology"], ctx["t"]
    got = np.asarray(ctx["ccg"]._step_11_doppler_matrix(
        topo, rays.aoa, rays.zoa, jax.numpy.asarray(t)))
    aoa = np.asarray(rays.aoa)
    zoa = np.asarray(rays.zoa)
    vel = np.asarray(topo.velocities)     # [b, rx, 3]
    lam = ctx["lam"]
    b, s, u, cl, m = aoa.shape
    idx = np.random.default_rng(5).integers(
        0, [b, s, u, cl, m], size=(16, 5))
    for bi, si, ui, ci, mi in idx:
        rho = sph_unit_vectors(zoa[bi, si, ui, ci, mi],
                               aoa[bi, si, ui, ci, mi])[0]
        ref = np.exp(1j * 2 * np.pi / lam * (rho @ vel[bi, ui]) * t)
        assert max_rel_err(ref, got[bi, si, ui, ci, mi]) < MAX_ERR


def test_array_offsets(ctx):
    rays, topo = ctx["rays"], ctx["topology"]
    got = np.asarray(ctx["ccg"]._step_11_array_offsets(
        topo, rays.aoa, rays.aod, rays.zoa, rays.zod))
    lam = ctx["lam"]
    aoa = np.asarray(rays.aoa)
    zoa = np.asarray(rays.zoa)
    aod = np.asarray(rays.aod)
    zod = np.asarray(rays.zod)
    d_rx = np.asarray(ctx["ccg"]._rx_antenna_positions_gcs(topo))
    d_tx = np.asarray(ctx["ccg"]._tx_antenna_positions_gcs(topo))
    b, s, u, cl, m = aoa.shape
    idx = np.random.default_rng(6).integers(
        0, [b, s, u, cl, m], size=(12, 5))
    for bi, si, ui, ci, mi in idx:
        r_rx = sph_unit_vectors(zoa[bi, si, ui, ci, mi],
                                aoa[bi, si, ui, ci, mi])[0]
        r_tx = sph_unit_vectors(zod[bi, si, ui, ci, mi],
                                aod[bi, si, ui, ci, mi])[0]
        ref = (np.exp(1j * 2 * np.pi / lam * (d_rx[bi, ui] @ r_rx))
               [:, None]
               * np.exp(1j * 2 * np.pi / lam
                        * (d_tx[bi, si] @ r_tx))[None, :])
        assert max_rel_err(ref, got[bi, si, ui, ci, mi]) < MAX_ERR


def test_field_matrix(ctx):
    """(7.5-22) field term: per-antenna polarized response assembled
    independently: F_rx^T Phase F_tx with LCS pattern evaluation and
    3D-vector local-to-global rotation."""
    ccg, rays, topo = ctx["ccg"], ctx["rays"], ctx["topology"]
    h_phase = ccg._step_11_phase_matrix(
        jax.numpy.asarray(ctx["phi"]), rays)
    got = np.asarray(ccg._step_11_field_matrix(
        topo, rays.aoa, rays.aod, rays.zoa, rays.zod, h_phase))
    h_phase = np.asarray(h_phase)
    aoa, aod = np.asarray(rays.aoa), np.asarray(rays.aod)
    zoa, zod = np.asarray(rays.zoa), np.asarray(rays.zod)
    tx_or = np.asarray(topo.tx_orientations)
    rx_or = np.asarray(topo.rx_orientations)
    bs_arr, ut_arr = ctx["bs_array"], ctx["ut_array"]

    def gcs_field(array, orient, zen, az):
        """per-element [num_ant, 2] GCS field components"""
        r = rot_matrix_oracle(orient)
        rho = sph_unit_vectors(zen, az)[0]
        v = r.T @ rho
        zen_p = np.arccos(np.clip(v[2], -1, 1))
        az_p = np.angle(v[0] + 1j * v[1])
        _, thp, php = sph_unit_vectors(zen_p, az_p)
        _, th, ph = sph_unit_vectors(zen, az)
        out = np.zeros((array.num_ant, 2), complex)
        pol2 = set(np.asarray(array.ant_ind_pol2).tolist())
        for a in range(array.num_ant):
            ant = (array.ant_pol2 if a in pol2 else array.ant_pol1)
            f_th, f_ph = ant.field(zen_p, az_p)
            v3 = r @ (complex(np.asarray(f_th)) * thp
                      + complex(np.asarray(f_ph)) * php)
            out[a] = [th @ v3, ph @ v3]
        return out

    b, s, u, cl, m = aoa.shape
    idx = np.random.default_rng(7).integers(
        0, [b, s, u, cl, m], size=(6, 5))
    for bi, si, ui, ci, mi in idx:
        f_tx = gcs_field(bs_arr, tx_or[bi, si],
                         zod[bi, si, ui, ci, mi],
                         aod[bi, si, ui, ci, mi])   # [txa, 2]
        f_rx = gcs_field(ut_arr, rx_or[bi, ui],
                         zoa[bi, si, ui, ci, mi],
                         aoa[bi, si, ui, ci, mi])   # [rxa, 2]
        ph_m = h_phase[bi, si, ui, ci, mi]
        ref = f_rx @ ph_m @ f_tx.T                  # [rxa, txa]
        assert max_rel_err(ref, got[bi, si, ui, ci, mi]) < 1e-6


# --------------------------------------------------------------- #
# Step-11 assembly
# --------------------------------------------------------------- #

def test_nlos_assembly(ctx):
    """(7.5-28): product of the validated factors with sqrt(P_n/M)
    scaling."""
    ccg, rays, topo, t = (ctx["ccg"], ctx["rays"], ctx["topology"],
                          ctx["t"])
    phi_j = jax.numpy.asarray(ctx["phi"])
    h_phase = ccg._step_11_phase_matrix(phi_j, rays)
    h_field = np.asarray(ccg._step_11_field_matrix(
        topo, rays.aoa, rays.aod, rays.zoa, rays.zod, h_phase))
    h_array = np.asarray(ccg._step_11_array_offsets(
        topo, rays.aoa, rays.aod, rays.zoa, rays.zod))
    h_doppler = np.asarray(ccg._step_11_doppler_matrix(
        topo, rays.aoa, rays.zoa, jax.numpy.asarray(t)))
    got = np.asarray(ccg._step_11_nlos(phi_j, topo, rays,
                                       jax.numpy.asarray(t)))
    powers = np.asarray(rays.powers)
    num_rays = got.shape[4]
    ref = ((h_field * h_array)[..., None]
           * h_doppler[..., None, None, :]
           * np.sqrt(powers / num_rays)[..., None, None, None, None])
    assert max_rel_err(ref, got) < MAX_ERR


def test_reduce_nlos_subclustering(ctx):
    """(7.5-27)/Table 7.5-5: the two strongest clusters split into
    sub-clusters with fixed ray index sets and delay offsets
    {0, 1.28, 2.56} * cDS; everything sorted by delay."""
    ccg, rays = ctx["ccg"], ctx["rays"]
    t = jax.numpy.asarray(ctx["t"])
    phi_j = jax.numpy.asarray(ctx["phi"])
    h_full = np.asarray(ccg._step_11_nlos(phi_j, ctx["topology"],
                                          rays, t))
    h_nlos, delays = ccg._step_11_reduce_nlos(
        jax.numpy.asarray(h_full), rays, jax.numpy.asarray(
            ctx["c_ds"]))
    h_nlos, delays = np.asarray(h_nlos), np.asarray(delays)

    powers = np.asarray(rays.powers)
    rdelays = np.asarray(rays.delays)
    c_ds = np.asarray(ctx["c_ds"])
    sub1 = [0, 1, 2, 3, 4, 5, 6, 7, 18, 19]
    sub2 = [8, 9, 10, 11, 16, 17]
    sub3 = [12, 13, 14, 15]
    b, s, u = powers.shape[:3]
    n_cl = powers.shape[3]
    for bi in range(b):
        for si in range(s):
            for ui in range(u):
                order = np.argsort(-powers[bi, si, ui])
                strong, weak = order[:2], order[2:]
                # sub-clusters grouped per delay offset then cluster
                # (matching the delay construction order)
                parts_by_offset, dls = [], []
                for k in range(3):
                    for c in strong:
                        sub = (sub1, sub2, sub3)[k]
                        parts_by_offset.append(
                            h_full[bi, si, ui, c, sub].sum(0))
                        dls.append(rdelays[bi, si, ui, c]
                                   + [0., 1.28, 2.56][k]
                                   * c_ds[bi, si, ui])
                for c in weak:
                    parts_by_offset.append(
                        h_full[bi, si, ui, c].sum(0))
                    dls.append(rdelays[bi, si, ui, c])
                parts_by_offset = np.stack(parts_by_offset)
                dls = np.asarray(dls)
                srt = np.argsort(dls)
                np.testing.assert_allclose(
                    delays[bi, si, ui], dls[srt], rtol=1e-9)
                assert max_rel_err(parts_by_offset[srt],
                                   h_nlos[bi, si, ui]) < MAX_ERR


def test_los_combination(ctx):
    """(7.5-30): K-factor weighting of LoS and NLoS components for
    LoS links; pure NLoS elsewhere."""
    ccg, rays, topo, t = (ctx["ccg"], ctx["rays"], ctx["topology"],
                          ctx["t"])
    t_j = jax.numpy.asarray(t)
    phi_j = jax.numpy.asarray(ctx["phi"])
    h_full = ccg._step_11_nlos(phi_j, topo, rays, t_j)
    h_nlos, _ = ccg._step_11_reduce_nlos(
        h_full, rays, jax.numpy.asarray(ctx["c_ds"]))
    h_los = np.asarray(ccg._step_11_los(topo, t_j))
    h_nlos = np.asarray(h_nlos)
    k = np.asarray(ctx["lsp"].k_factor)[..., None, None, None, None]
    ref_los = (h_los * np.sqrt(k / (k + 1)))
    ref = h_nlos * np.sqrt(1 / (k + 1))
    ref[:, :, :, :1] += ref_los
    los = np.asarray(topo.los)
    got = ctx["h"]
    for bi in range(got.shape[0]):
        for si in range(got.shape[1]):
            for ui in range(got.shape[2]):
                expect = (ref[bi, si, ui] if los[bi, si, ui]
                          else h_nlos[bi, si, ui])
                assert max_rel_err(expect, got[bi, si, ui]) < MAX_ERR


def test_los_delay_phase(ctx):
    """(7.5-29): the LoS ray carries the exp(j 2 pi d3D/lambda)
    propagation phase."""
    ccg, topo, t = ctx["ccg"], ctx["topology"], ctx["t"]
    h_los = np.asarray(ccg._step_11_los(topo, jax.numpy.asarray(t)))
    d3d = np.asarray(topo.distance_3d)
    lam = ctx["lam"]
    # strip the phase and re-apply the conjugate: magnitude must be
    # unchanged and the phase factor must match exactly
    ph = np.exp(1j * 2 * np.pi * d3d / lam)
    h_stripped = h_los / ph[..., None, None, None, None]
    h2 = h_stripped * ph[..., None, None, None, None]
    assert max_rel_err(h_los, h2) < 1e-12
    # and with zero distance the factor is 1: check functional dep by
    # recomputing with a modified topology
    topo2 = Topology(
        velocities=topo.velocities, moving_end=topo.moving_end,
        los_aoa=topo.los_aoa, los_aod=topo.los_aod,
        los_zoa=topo.los_zoa, los_zod=topo.los_zod, los=topo.los,
        distance_3d=np.zeros_like(np.asarray(topo.distance_3d)),
        tx_orientations=topo.tx_orientations,
        rx_orientations=topo.rx_orientations)
    h0 = np.asarray(ccg._step_11_los(topo2, jax.numpy.asarray(t)))
    assert max_rel_err(h0 * ph[..., None, None, None, None],
                       h_los) < 1e-9
