"""SYS package tests: EESM, PHY abstraction, link adaptation,
scheduling, power control, hex-grid topology, utils."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sionna_tpu.sys import (
    EESM, PHYAbstraction, InnerLoopLinkAdaptation,
    OuterLoopLinkAdaptation, PFSchedulerSUMIMO, HexGrid, Hexagon,
    gen_hexgrid_topology, get_num_hex_in_grid, convert_hex_coord,
    open_loop_uplink_power_control, downlink_fair_power_control,
    get_pathloss, is_scheduled_in_slot, spread_across_subcarriers)
from sionna_tpu.phy.utils import db_to_lin, dbm_to_watt


@pytest.fixture(scope="module")
def phy_abs():
    return PHYAbstraction()


# ----------------------------------------------------------------------
# EESM
# ----------------------------------------------------------------------
def test_eesm_flat_sinr_identity():
    """For a flat SINR profile, the effective SINR equals the SINR."""
    eesm = EESM()
    sinr = jnp.full((1, 2, 8, 3, 1), 5.0)
    out = np.asarray(eesm(sinr, mcs_index=10))
    np.testing.assert_allclose(out, 5.0, rtol=1e-5)


def test_eesm_below_min():
    eesm = EESM()
    sinr = jnp.full((1, 2, 8, 2, 1), 2.0)
    # mark second user unscheduled
    sinr = sinr.at[..., 1, :].set(0.)
    out = np.asarray(eesm(sinr, mcs_index=5))
    assert out[0, 0] == pytest.approx(2.0, rel=1e-5)
    assert out[0, 1] == 0.


def test_eesm_dominated_by_worst():
    """EESM is below the arithmetic mean (pessimistic aggregation)."""
    eesm = EESM()
    sinr_vals = np.ones((1, 1, 10, 1, 1))
    sinr_vals[0, 0, :5] = 100.
    sinr_vals[0, 0, 5:] = 1.
    out = float(np.asarray(eesm(jnp.asarray(sinr_vals),
                                mcs_index=20))[0, 0])
    assert out < np.mean(sinr_vals)
    assert out > 1.


def test_eesm_per_stream():
    eesm = EESM()
    sinr = jnp.exp(jax.random.normal(jax.random.PRNGKey(0),
                                     (2, 4, 8, 3, 2)))
    out = eesm(sinr, mcs_index=jnp.full((2, 3), 10), per_stream=True)
    assert out.shape == (2, 3, 2)


# ----------------------------------------------------------------------
# PHYAbstraction
# ----------------------------------------------------------------------
def test_phy_abstraction_bler_monotone(phy_abs):
    """BLER must decrease with SINR and increase with MCS."""
    sinr_eff = jnp.asarray(db_to_lin(np.linspace(-5, 25, 10)))
    n_re = jnp.full((10,), 500, jnp.int32)
    mcs = jnp.full((10,), 10, jnp.int32)
    *_, tbler, bler = phy_abs(mcs, sinr_eff=sinr_eff,
                              num_allocated_re=n_re,
                              key=jax.random.PRNGKey(0))
    bler = np.asarray(bler)
    assert bler[0] > 0.9         # low SINR -> certain failure
    assert bler[-1] < 1e-3       # high SINR -> success
    assert np.all(np.diff(bler) <= 1e-6)
    # higher MCS at fixed SINR -> higher BLER (tables cover MCS 3-27)
    sinr_fix = jnp.full((25,), float(db_to_lin(10.)))
    mcs_range = jnp.arange(3, 28, dtype=jnp.int32)
    *_, bler2 = phy_abs(mcs_range, sinr_eff=sinr_fix,
                        num_allocated_re=jnp.full((25,), 500),
                        key=jax.random.PRNGKey(1))
    bler2 = np.asarray(bler2)
    assert bler2[0] < 0.01 and bler2[-1] > 0.9
    # out-of-table MCS -> Inf marker (as in the reference)
    *_, bler3 = phy_abs(jnp.asarray([0]),
                        sinr_eff=jnp.asarray([1.]),
                        num_allocated_re=jnp.asarray([100]),
                        key=jax.random.PRNGKey(2))
    assert np.isinf(np.asarray(bler3)[0])


def test_phy_abstraction_harq_and_bits(phy_abs):
    # Very high SINR: always ACK, bits decoded
    sinr_eff = jnp.asarray([1e4, 1e-3, 0.])
    n_re = jnp.asarray([100, 100, 0])
    mcs = jnp.asarray([5, 5, 5])
    bits, harq, se, tbler, bler = phy_abs(
        mcs, sinr_eff=sinr_eff, num_allocated_re=n_re,
        key=jax.random.PRNGKey(2))
    bits, harq = np.asarray(bits), np.asarray(harq)
    assert harq[0] == 1 and bits[0] > 0
    assert harq[1] == 0 and bits[1] == 0   # certain NACK
    assert harq[2] == -1 and bits[2] == 0  # not scheduled
    assert np.asarray(tbler)[2] == -1.


def test_phy_abstraction_from_sinr_grid(phy_abs):
    sinr = jnp.full((2, 4, 8, 3, 2), float(db_to_lin(20.)))
    out = phy_abs(jnp.full((2, 3), 10), sinr=sinr,
                  key=jax.random.PRNGKey(3))
    bits = np.asarray(out[0])
    assert bits.shape == (2, 3)
    assert np.all(bits > 0)


def test_phy_abstraction_new_bler_table(phy_abs):
    """Monte-Carlo regeneration of one BLER point via the 5G coded
    AWGN channel."""
    sim_set = {"category": {0: {"index": {1: {"MCS": [5]}}}}}
    new_table = phy_abs.new_bler_table(
        [20.], [200], sim_set, batch_size=64, max_mc_iter=2,
        verbose=False)
    bler = new_table["category"][0]["index"][1]["MCS"][5]["CBS"][200][
        "BLER"]
    assert len(bler) == 1
    assert 0. <= bler[0] <= 1.
    # at 20 dB SNR with MCS 5 (QPSK r~0.44), BLER must be ~0
    assert bler[0] < 0.1


# ----------------------------------------------------------------------
# Link adaptation
# ----------------------------------------------------------------------
def test_illa_monotone_in_sinr(phy_abs):
    illa = InnerLoopLinkAdaptation(phy_abs, bler_target=0.1)
    sinr_eff = jnp.asarray([0.1, 10., 1000.])
    n_re = jnp.asarray([200, 200, 200])
    mcs = np.asarray(illa(sinr_eff=sinr_eff, num_allocated_re=n_re))
    assert mcs[0] < mcs[1] < mcs[2]
    # unscheduled user -> fill value
    mcs2 = np.asarray(illa(sinr_eff=jnp.asarray([10., 10.]),
                           num_allocated_re=jnp.asarray([200, 0])))
    assert mcs2[1] == 0


def test_illa_respects_bler_target(phy_abs):
    illa = InnerLoopLinkAdaptation(phy_abs, bler_target=0.1)
    sinr_eff = jnp.asarray([float(db_to_lin(12.))])
    n_re = jnp.asarray([500])
    mcs = np.asarray(illa(sinr_eff=sinr_eff, num_allocated_re=n_re))
    # verify the TBLER of the selected MCS is below target
    *_, tbler, _ = phy_abs(jnp.asarray(mcs), sinr_eff=sinr_eff,
                           num_allocated_re=n_re,
                           key=jax.random.PRNGKey(0))
    assert float(np.asarray(tbler)[0]) <= 0.1 + 1e-6
    # and MCS+1 violates it
    *_, tbler_up, _ = phy_abs(jnp.asarray(mcs) + 1, sinr_eff=sinr_eff,
                              num_allocated_re=n_re,
                              check_mcs_index_validity=False,
                              key=jax.random.PRNGKey(0))
    assert float(np.asarray(tbler_up)[0]) > 0.1


def test_olla_offset_dynamics(phy_abs):
    olla = OuterLoopLinkAdaptation(phy_abs, num_ut=3,
                                   bler_target=0.1, delta_up=1.)
    n_re = np.full((3,), 300)
    # NACK increases offset by delta_up; ACK decreases by delta_down
    olla(n_re, harq_feedback=np.asarray([0, 1, -1]),
         sinr_eff=np.asarray([10., 10., 10.]))
    off = olla.offset
    assert off[0] == pytest.approx(1.0)
    assert off[1] == pytest.approx(-olla.delta_down)
    assert off[2] == 0.
    assert olla.delta_down == pytest.approx(1. * 0.1 / 0.9)
    # NACKed user gets a more conservative MCS than ACKed user
    for _ in range(10):
        mcs = np.asarray(olla(n_re,
                              harq_feedback=np.asarray([0, 1, 1]),
                              sinr_eff=np.asarray([10., 10., 10.])))
    assert mcs[0] < mcs[1]


def test_olla_functional_step_matches_eager(phy_abs):
    """The scan-fusable OLLA.step must reproduce the stateful eager
    loop exactly (offsets and MCS decisions) over a slot sequence."""
    num_ut, n_slots = 3, 12
    rng = np.random.default_rng(5)
    n_re = np.full((num_ut,), 300)
    sinrs = rng.exponential(float(db_to_lin(10.)), (n_slots, num_ut))
    harqs = rng.integers(-1, 2, (n_slots, num_ut)).astype(np.int32)

    olla_e = OuterLoopLinkAdaptation(phy_abs, num_ut=num_ut,
                                     bler_target=0.1, delta_up=1.)
    mcs_eager = [np.asarray(olla_e(n_re, harq_feedback=harqs[s],
                                   sinr_eff=sinrs[s]))
                 for s in range(n_slots)]

    olla_f = OuterLoopLinkAdaptation(phy_abs, num_ut=num_ut,
                                     bler_target=0.1, delta_up=1.)
    n_re_j = jnp.asarray(n_re, jnp.int32)

    @jax.jit
    def run(state, sinrs, harqs):
        def body(state, xs):
            sinr, harq = xs
            return olla_f.step(state, n_re_j, harq_feedback=harq,
                               sinr_eff=sinr)
        return jax.lax.scan(body, state,
                            (jnp.asarray(sinrs), jnp.asarray(harqs)))

    (off, _), mcs_scan = run(olla_f.init_state(), sinrs, harqs)
    np.testing.assert_array_equal(np.stack(mcs_eager),
                                  np.asarray(mcs_scan))
    np.testing.assert_allclose(np.asarray(off), olla_e.offset,
                               rtol=1e-6)


# ----------------------------------------------------------------------
# Scheduling
# ----------------------------------------------------------------------
def test_pf_scheduler():
    sched = PFSchedulerSUMIMO(num_ut=3, num_freq_res=4, num_ofdm_sym=2,
                              batch_size=2, num_streams_per_ut=2)
    rate_last = np.ones((2, 3))
    rate_ach = np.random.default_rng(0).uniform(
        1., 2., (2, 2, 4, 3))
    sched_mask = np.asarray(sched(rate_last, rate_ach))
    assert sched_mask.shape == (2, 2, 4, 3, 2)
    # exactly one user per resource
    assert np.all(sched_mask.sum(axis=3) == 1)
    # the scheduled user maximizes the PF metric
    best = np.argmax(rate_ach, axis=-1)
    assert np.all(np.argmax(sched_mask[..., 0], axis=-1) == best)


def test_pf_scheduler_fairness():
    """A user with huge past rate gets deprioritized."""
    sched = PFSchedulerSUMIMO(num_ut=2, num_freq_res=4, num_ofdm_sym=1,
                              beta=0.5)
    rate_ach = np.ones((1, 4, 2))
    # user 0 has 100x the past rate
    m1 = np.asarray(sched(np.asarray([100., 1.]), rate_ach))
    assert np.all(m1[..., 1, :])  # user 1 wins everything


# ----------------------------------------------------------------------
# Power control
# ----------------------------------------------------------------------
def test_open_loop_uplink_power_control():
    pl_db = np.asarray([80., 100., 140.])
    p = np.asarray(open_loop_uplink_power_control(
        db_to_lin(pl_db), jnp.asarray([48, 48, 48]),
        alpha=1., p0_dbm=-90., ut_max_power_dbm=26.))
    # full compensation: rx power per PRB = p0 => tx = p0+PL+10log10(4)
    expect_dbm = -90. + pl_db + 10 * np.log10(4)
    expect_w = 10 ** ((expect_dbm - 30) / 10)
    np.testing.assert_allclose(p[:2], expect_w[:2], rtol=1e-5)
    # third UT hits the max power cap
    assert p[2] == pytest.approx(10 ** ((26. - 30) / 10), rel=1e-6)
    # zero allocation -> zero power
    p0 = np.asarray(open_loop_uplink_power_control(
        db_to_lin(pl_db), jnp.asarray([0, 48, 48])))
    assert p0[0] == 0.


@pytest.mark.parametrize("fairness", [0., 1.])
def test_downlink_fair_power_control(fairness):
    pl = np.asarray(db_to_lin(np.asarray([80., 90., 100.])))
    p, u = downlink_fair_power_control(
        jnp.asarray(pl), interference_plus_noise=5e-10,
        num_allocated_re=10, bs_max_power_dbm=46.,
        guaranteed_power_ratio=0.25, fairness=fairness)
    p, u = np.asarray(p), np.asarray(u)
    max_p = float(dbm_to_watt(46.))
    # total power budget respected
    assert p.sum() == pytest.approx(max_p, rel=0.01)
    assert np.all(p >= 0.25 * max_p / 3 * 0.99)
    assert np.all(u > 0)
    if fairness == 0.:
        # waterfilling p = mu_inv - 1/q: best channel gets most power
        assert p[0] >= p[1] >= p[2]


def test_downlink_fair_power_higher_fairness_is_flatter():
    pl = np.asarray(db_to_lin(np.asarray([70., 110.])))
    spread = []
    for f in (0., 5.):
        p, _ = downlink_fair_power_control(
            jnp.asarray(pl), interference_plus_noise=5e-10,
            num_allocated_re=1, bs_max_power_dbm=46.,
            guaranteed_power_ratio=0., fairness=f)
        p = np.asarray(p)
        spread.append(p.max() / max(p.min(), 1e-12))
    assert spread[1] < spread[0] * 1.01


# ----------------------------------------------------------------------
# Hex grid topology
# ----------------------------------------------------------------------
def test_hex_coord_roundtrip():
    assert get_num_hex_in_grid(1) == 7
    assert get_num_hex_in_grid(2) == 19
    offs = np.array([[0, 0], [1, 0], [-2, 3]])
    ax = convert_hex_coord(offs, "offset2axial")
    back = convert_hex_coord(ax, "axial2offset")
    np.testing.assert_array_equal(back, offs)
    eu = convert_hex_coord(offs, "offset2euclid", hex_radius=2.)
    back2 = convert_hex_coord(eu, "euclid2offset", hex_radius=2.)
    np.testing.assert_array_equal(back2, offs)


def test_hexgrid_structure():
    grid = HexGrid(cell_radius=1., cell_height=10., num_rings=1)
    assert grid.num_cells == 7
    loc = grid.cell_loc
    assert loc.shape == (7, 3)
    np.testing.assert_allclose(loc[0], [0., 0., 10.], atol=1e-6)
    # ring-1 neighbors at ISD = sqrt(3)*radius
    d = np.linalg.norm(loc[1:, :2], axis=-1)
    np.testing.assert_allclose(d, np.sqrt(3.), rtol=1e-6)
    assert grid.isd == pytest.approx(np.sqrt(3.))
    # mirror cells: 7 per cell
    assert grid.mirror_cell_loc.shape == (7, 7, 3)


def test_hexgrid_drop_and_wraparound():
    grid = HexGrid(isd=200., cell_height=25., num_rings=1)
    ut_loc, mirror_loc, wrap_dist = grid(4, 5, min_bs_ut_dist=10.)
    assert ut_loc.shape == (4, 7, 3, 5, 3)
    assert wrap_dist.shape == (4, 7, 3, 5, 7)
    assert mirror_loc.shape == (4, 7, 3, 5, 7, 3)
    # wraparound distance <= direct distance to the base cell
    direct = np.linalg.norm(
        ut_loc[:, :, :, :, None, :] - grid.cell_loc[None, None, None,
                                                    None, :, :],
        axis=-1)
    assert np.all(wrap_dist <= direct + 1e-6)
    # each UT is in its own cell: direct distance to own cell center
    # bounded by cell radius (in 2D)
    for c in range(7):
        d2d = np.linalg.norm(
            ut_loc[:, c, :, :, :2]
            - grid.cell_loc[c, :2][None, None, None], axis=-1)
        assert np.all(d2d <= grid.cell_radius + 1e-6)


def test_gen_hexgrid_topology_with_channel():
    from sionna_tpu.phy.channel.tr38901 import PanelArray, UMi
    bs_array = PanelArray(num_rows_per_panel=1, num_cols_per_panel=1,
                          polarization="single",
                          polarization_type="V",
                          antenna_pattern="omni",
                          carrier_frequency=3.5e9)
    ut_array = PanelArray(num_rows_per_panel=1, num_cols_per_panel=1,
                          polarization="single",
                          polarization_type="V",
                          antenna_pattern="omni",
                          carrier_frequency=3.5e9)
    topo = gen_hexgrid_topology(2, 1, 2, "umi", return_grid=False)
    (ut_loc, bs_loc, ut_or, bs_or, ut_vel, in_state, los,
     bs_virtual_loc) = topo
    num_cells = 7
    assert ut_loc.shape == (2, num_cells * 3 * 2, 3)
    assert bs_loc.shape == (2, num_cells * 3, 3)
    assert bs_virtual_loc.shape == (2, num_cells * 3,
                                    num_cells * 3 * 2, 3)
    model = UMi(3.5e9, "low", ut_array, bs_array, "uplink")
    model.set_topology(*topo)
    a, tau = model(2, 30.72e6, key=jax.random.PRNGKey(0))
    assert a.shape[3] == num_cells * 3 * 2  # num_tx = num UTs
    assert np.all(np.isfinite(np.asarray(tau)))


# ----------------------------------------------------------------------
# SYS utils
# ----------------------------------------------------------------------
def test_is_scheduled_in_slot():
    sinr = jnp.zeros((2, 4, 8, 3, 2)).at[..., 1, :].set(1.)
    sch = np.asarray(is_scheduled_in_slot(sinr=sinr))
    np.testing.assert_array_equal(sch, [[False, True, False]] * 2)


def test_get_pathloss():
    rng = np.random.default_rng(5)
    g = 10. ** (-np.asarray([8., 10.]) / 2)  # amplitude gains
    h = np.zeros((1, 2, 2, 2, 2, 3, 12), complex)
    for rx in range(2):
        h[0, rx, :, rx, :] = g[rx]
    pl_all, pl_serv = get_pathloss(jnp.asarray(h),
                                   rx_tx_association=np.eye(2, dtype=int))
    pl_all = np.asarray(pl_all)
    np.testing.assert_allclose(pl_all[0, 0, 0], 1e8, rtol=1e-4)
    np.testing.assert_allclose(pl_all[0, 1, 1], 1e10, rtol=1e-4)
    assert np.asarray(pl_serv).shape == (1, 2, 3)
    np.testing.assert_allclose(np.asarray(pl_serv)[0, 1], 1e10,
                               rtol=1e-4)


def test_spread_across_subcarriers():
    num_sym, num_sc, num_ut, num_str = 2, 8, 3, 1
    is_sched = np.zeros((num_sym, num_sc, num_ut, num_str), bool)
    is_sched[:, :4, 0] = True    # ut0: 4 subcarriers x 2 syms
    is_sched[:, 4:, 1] = True    # ut1: rest
    p_ut = np.asarray([[4., 8., 1.]] * num_sym)
    tx_p = np.asarray(spread_across_subcarriers(
        jnp.asarray(p_ut), jnp.asarray(is_sched)))
    assert tx_p.shape == (num_ut, num_str, num_sym, num_sc)
    # power is per OFDM symbol: ut0 spreads 4 W over its 4 allocated
    # subcarriers in each symbol -> 1 W each
    np.testing.assert_allclose(tx_p[0, 0, :, :4], 1.)
    np.testing.assert_allclose(tx_p[0, 0, :, 4:], 0.)
    np.testing.assert_allclose(tx_p[1, 0, :, 4:], 2.)
    # unscheduled ut2 radiates nothing
    np.testing.assert_allclose(tx_p[2], 0.)
