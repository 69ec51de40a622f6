"""Ray tracing tests: Friis, reflection/Fresnel physics, occlusion,
multi-bounce, arrays, Doppler, radio maps, scene IO."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sionna_tpu.rt import (load_scene, Scene, Transmitter, Receiver,
                           Camera, PlanarArray, PathSolver,
                           RadioMapSolver, RadioMaterial,
                           ITU_MATERIALS, antenna_pattern)
from sionna_tpu.phy.constants import SPEED_OF_LIGHT as C


def _iso():
    return PlanarArray(1, 1, pattern="iso", polarization="V")


def _los_scene(freq=3e9, d=100.):
    sc = load_scene("empty", frequency=freq)
    sc.tx_array = _iso()
    sc.rx_array = _iso()
    sc.add(Transmitter("tx", [0., 0., 0.]))
    sc.add(Receiver("rx", [d, 0., 0.]))
    return sc


def test_friis_free_space():
    d, f = 100., 3e9
    sc = _los_scene(f, d)
    paths = PathSolver()(sc, max_depth=0)
    a, tau = paths.cir(out_type="numpy")
    lam = C / f
    np.testing.assert_allclose(np.abs(a[0, 0, 0, 0, 0, 0]) ** 2,
                               (lam / (4 * np.pi * d)) ** 2,
                               rtol=1e-6)
    np.testing.assert_allclose(tau[0, 0, 0], d / C, rtol=1e-9)
    # phase = -2 pi d / lambda
    expected_phase = np.angle(np.exp(-2j * np.pi * d / lam))
    np.testing.assert_allclose(np.angle(a[0, 0, 0, 0, 0, 0]),
                               expected_phase, atol=1e-3)


def test_single_metal_reflection():
    sc = load_scene("simple_reflector", frequency=3e9)
    sc.tx_array = _iso()
    sc.rx_array = _iso()
    sc.add(Transmitter("tx", [-5., 0., 5.]))
    sc.add(Receiver("rx", [5., 0., 5.]))
    p = PathSolver()(sc, max_depth=1, samples_per_src=5000)
    v = np.asarray(p.valid)[0, 0]
    lens = np.sort(np.asarray(p.tau)[0, 0][v] * C)
    # LoS at 10 m + image path at sqrt(200); edge-shared triangles
    # must NOT double-count the specular path
    np.testing.assert_allclose(lens, [10., np.sqrt(200.)], rtol=1e-6)
    # metal reflection: |r| ~ 1 -> image-distance Friis
    lam = C / 3e9
    a = np.asarray(p.a)[0, 0, 0, 0][v]
    g_ref = np.abs(a[np.argsort(np.asarray(p.tau)[0, 0][v])[1]]) ** 2
    np.testing.assert_allclose(
        g_ref, (lam / (4 * np.pi * np.sqrt(200.))) ** 2, rtol=5e-3)


def test_two_ray_matches_analytic():
    """Ground reflection over medium-dry ground: solver must match
    the analytic two-ray TM model in amplitude AND phase."""
    f = 1e9
    lam = C / f
    sc = load_scene("simple_reflector", frequency=f)
    sc.set_material("itu_medium_dry_ground")
    sc.tx_array = _iso()
    sc.rx_array = _iso()
    ht, hr, d = 2., 2., 8.
    sc.add(Transmitter("tx", [-d / 2, 0., ht]))
    sc.add(Receiver("rx", [d / 2, 0., hr]))
    p = PathSolver()(sc, max_depth=1, samples_per_src=5000)
    a, _ = p.cir(out_type="numpy")
    v = np.asarray(p.valid)[0, 0]
    total = np.sum(a[0, 0, 0, 0, v, 0])

    d1 = np.sqrt(d ** 2 + (ht - hr) ** 2)
    d2 = np.sqrt(d ** 2 + (ht + hr) ** 2)
    eta = 15. - 1j * 17.98 * 0.035  # ITU medium dry ground @ 1 GHz
    cos_i = (ht + hr) / d2
    root = np.sqrt(eta - (1 - cos_i ** 2))
    r_p = (eta * cos_i - root) / (eta * cos_i + root)
    ref = (lam / (4 * np.pi * d1) * np.exp(-2j * np.pi * d1 / lam)
           + lam / (4 * np.pi * d2) * np.exp(-2j * np.pi * d2 / lam)
           * r_p)
    np.testing.assert_allclose(total, ref, rtol=1e-5)


def test_occlusion_blocks_los():
    sc = load_scene("simple_wedge", frequency=3e9)  # wall at x=0
    sc.tx_array = _iso()
    sc.rx_array = _iso()
    sc.add(Transmitter("tx", [-5., 0., 5.]))
    sc.add(Receiver("rx", [5., 0., 5.]))
    # refraction=False: strict occlusion semantics (with the default
    # refraction=True the blocked LoS survives attenuated — see
    # tests/test_rt_refraction.py)
    p = PathSolver()(sc, max_depth=1, samples_per_src=5000,
                     refraction=False)
    v = np.asarray(p.valid)[0, 0]
    lens = np.asarray(p.tau)[0, 0][v] * C
    assert not np.any(np.isclose(lens, 10., atol=1e-3))


def test_double_bounce_parallel_plates():
    sc = load_scene("double_reflector", frequency=3e9)
    sc.tx_array = _iso()
    sc.rx_array = _iso()
    sc.add(Transmitter("tx", [-10., 0., 10.]))
    sc.add(Receiver("rx", [10., 0., 10.]))
    p = PathSolver()(sc, max_depth=2, samples_per_src=30000)
    v = np.asarray(p.valid)[0, 0]
    lens = np.sort(np.asarray(p.tau)[0, 0][v] * C)
    expected = [20., np.sqrt(800.), np.sqrt(800.),
                np.sqrt(2000.), np.sqrt(2000.)]
    np.testing.assert_allclose(lens, expected, rtol=1e-6)


def test_fresnel_energy_conservation():
    """Reflection coefficients never exceed unit magnitude."""
    for name, mat in ITU_MATERIALS.items():
        eta = mat.complex_relative_permittivity(3.5e9)
        for cos_i in np.linspace(0.01, 1., 20):
            root = np.sqrt(eta - (1 - cos_i ** 2))
            r_s = (cos_i - root) / (cos_i + root)
            r_p = (eta * cos_i - root) / (eta * cos_i + root)
            assert np.abs(r_s) <= 1. + 1e-9, name
            assert np.abs(r_p) <= 1. + 1e-9, name


def test_array_phase_response():
    sc = load_scene("empty", frequency=3e9)
    sc.tx_array = _iso()
    sc.rx_array = PlanarArray(1, 4, pattern="iso", polarization="V")
    sc.add(Transmitter("tx", [100., 0., 0.]))
    sc.add(Receiver("rx", [0., 0., 0.]))
    p = PathSolver()(sc, max_depth=0)
    ph = np.angle(np.asarray(p.a)[0, :, 0, 0, 0])
    # broadside: identical phases
    np.testing.assert_allclose(ph, ph[0], atol=1e-6)
    # endfire (tx along the array axis): lambda/2 spacing -> pi steps
    sc.remove("tx")
    sc.add(Transmitter("tx", [0., 100., 0.]))
    p2 = PathSolver()(sc, max_depth=0)
    a2 = np.asarray(p2.a)[0, :, 0, 0, 0]
    dph = np.abs(np.diff(np.unwrap(np.angle(a2))))
    np.testing.assert_allclose(dph, np.pi, atol=1e-2)


def test_dual_polarization_ports():
    arr = PlanarArray(2, 2, pattern="iso", polarization="VH")
    assert arr.num_ant == 8
    sc = _los_scene()
    sc.rx_array = PlanarArray(1, 1, pattern="iso",
                              polarization="cross")
    p = PathSolver()(sc, max_depth=0)
    assert p.a.shape[1] == 2  # two polarization ports


def test_doppler_and_cir():
    sc = load_scene("empty", frequency=3e9)
    sc.tx_array = _iso()
    sc.rx_array = _iso()
    sc.add(Transmitter("tx", [100., 0., 0.]))
    sc.add(Receiver("rx", [0., 0., 0.], velocity=[30., 0., 0.]))
    p = PathSolver()(sc, max_depth=0)
    fd = float(np.asarray(p.doppler)[0, 0, 0])
    np.testing.assert_allclose(fd, 30. * 3e9 / C, rtol=1e-9)
    a, tau = p.cir(sampling_frequency=1e3, num_time_steps=8)
    assert a.shape == (1, 1, 1, 1, 1, 8)
    # phase rotates at the Doppler rate
    ph = np.unwrap(np.angle(np.asarray(a)[0, 0, 0, 0, 0]))
    np.testing.assert_allclose(np.diff(ph),
                               2 * np.pi * fd / 1e3, rtol=1e-4)


def test_paths_to_ofdm_channel_bridge():
    from sionna_tpu.phy.channel import (cir_to_ofdm_channel,
                                        subcarrier_frequencies)
    sc = load_scene("box", frequency=3.5e9)
    sc.tx_array = _iso()
    sc.rx_array = _iso()
    sc.add(Transmitter("tx", [-3., 0., 1.5]))
    sc.add(Receiver("rx", [3., 0., 1.5]))
    p = PathSolver()(sc, max_depth=2, samples_per_src=20000)
    a, tau = p.cir(sampling_frequency=1e3, num_time_steps=2)
    assert np.asarray(p.valid).sum() > 3  # LoS + wall bounces
    freqs = subcarrier_frequencies(32, 30e3)
    h = cir_to_ofdm_channel(freqs, a[None], jnp.asarray(tau)[None])
    assert h.shape == (1, 1, 1, 1, 1, 2, 32)
    assert np.all(np.isfinite(np.asarray(h).real))


def test_radio_map():
    sc = load_scene("simple_street_canyon", frequency=3.5e9)
    sc.tx_array = _iso()
    sc.add(Transmitter("tx", [0., 0., 10.], power_dbm=30.))
    rm = RadioMapSolver()(sc, cell_size=(10., 10.), size=(100., 16.),
                          center=(0., 0.), height=1.5, max_depth=1,
                          samples_per_src=5000)
    pg = np.asarray(rm.path_gain)[0]
    assert pg.shape == (2, 10)
    row = 10. * np.log10(np.maximum(pg[1], 1e-30))
    # decays from the center towards the street ends, symmetric-ish
    assert row[4] > row[0] and row[5] > row[9]
    np.testing.assert_allclose(row, row[::-1], atol=1.0)
    rss = np.asarray(rm.rss)[0]
    np.testing.assert_allclose(rss, pg * 1.0, rtol=1e-6)  # 30 dBm=1 W
    assert np.asarray(rm.sinr).shape == (2, 10)


def test_materials_itu_model():
    glass = ITU_MATERIALS["itu_glass"]
    assert glass.relative_permittivity(3.5e9) == pytest.approx(6.31)
    sigma = glass.conductivity(10e9)
    assert sigma == pytest.approx(0.0036 * 10 ** 1.3394, rel=1e-6)
    custom = RadioMaterial("my_mat", relative_permittivity=4.,
                           conductivity=0.1)
    eta = custom.complex_relative_permittivity(1e9)
    assert eta.real == pytest.approx(4.)
    with pytest.raises(ValueError):
        RadioMaterial("unknown_material")


def test_scene_management_and_obj_io(tmp_path):
    sc = load_scene("box")
    assert sc.num_triangles == 12
    cam = Camera("cam", [0., 0., 2.])
    sc.add(cam)
    assert sc.get("cam") is cam
    sc.add(Transmitter("t1", [0., 0., 1.]))
    sc.remove("t1")
    with pytest.raises(KeyError):
        sc.get("t1")
    # OBJ round trip
    obj = tmp_path / "tri.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\n"
                   "usemtl itu_metal\nf 1 2 3\n")
    sc2 = load_scene(str(obj))
    assert sc2.num_triangles == 1
    assert sc2.triangle_materials[0].name == "itu_metal"
    with pytest.raises(ValueError):
        load_scene("no_such_scene_or_file")


def test_antenna_patterns():
    th = jnp.asarray([np.pi / 2])
    for pat, peak in (("iso", 1.0), ("dipole", 1.5),
                      ("hw_dipole", 1.643)):
        et, ep = antenna_pattern(pat, th, jnp.asarray([0.]))
        assert float(et[0] ** 2 + ep[0] ** 2) == pytest.approx(
            peak, rel=1e-3)
    et, _ = antenna_pattern("tr38901", th, jnp.asarray([0.]))
    assert float(et[0] ** 2) == pytest.approx(10 ** 0.8, rel=1e-3)


def test_chunked_intersection_equivalence():
    """Triangle-chunked nearest-hit/occlusion (large-scene path) must
    match the single-shot dense computation."""
    from sionna_tpu.rt.solver import nearest_hit, any_blocking_hit
    rng = np.random.default_rng(0)
    tri = jnp.asarray(rng.normal(size=(500, 3, 3)) * 5.)
    orig = jnp.asarray(rng.normal(size=(200, 3)) * 10.)
    dirs = jnp.asarray(rng.normal(size=(200, 3)))
    t1, i1, h1 = nearest_hit(orig, dirs, tri)
    t2, i2, h2 = nearest_hit(orig, dirs, tri, max_elems=10_000)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_allclose(np.asarray(t1)[np.asarray(h1)],
                               np.asarray(t2)[np.asarray(h1)],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1)[np.asarray(h1)],
                                  np.asarray(i2)[np.asarray(h1)])
    excl = jnp.asarray(rng.integers(0, 500, (200, 2)))
    b1 = any_blocking_hit(orig, dirs, tri, excl_ids=excl)
    b2 = any_blocking_hit(orig, dirs, tri, excl_ids=excl,
                          max_elems=10_000)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


def test_scene_render():
    """Ray-cast rendering: geometry, shading, sky, device markers."""
    from sionna_tpu.rt import Camera
    sc = load_scene("simple_street_canyon")
    sc.add(Transmitter("tx", [0., 0., 30.]))   # above the street
    cam = Camera("cam", [0., -120., 80.])
    cam.look_at([0., 0., 10.])
    sc.add(cam)
    img = sc.render(resolution=(160, 120))
    assert img.shape == (120, 160, 3)
    assert img.min() >= 0. and img.max() <= 1.
    sky = np.all(np.isclose(img, [0.72, 0.82, 0.92], atol=1e-3),
                 axis=-1)
    # both sky and geometry visible
    assert 0.02 < sky.mean() < 0.98
    # the TX marker (flat red) is visible from this viewpoint
    assert (np.abs(img - [0.85, 0.15, 0.1]).sum(-1) < 1e-3).any()
    # empty scene renders pure sky
    from sionna_tpu.rt.scene import Scene
    empty = Scene(name="empty")
    empty.add(cam)
    img2 = empty.render(resolution=(32, 24))
    assert np.all(np.isclose(img2, [0.72, 0.82, 0.92], atol=1e-3))


def test_trace_functional_differentiable():
    """Differentiable solver surface: fn matches the standard trace
    at the baked arguments and is differentiable w.r.t. device
    positions and material parameters (upstream Sionna RT is a
    differentiable ray tracer; reference src/sionna/rt docs)."""
    sc = load_scene("simple_reflector", frequency=3e9)
    sc.set_material("itu_concrete")
    sc.tx_array = _iso()
    sc.rx_array = _iso()
    sc.add(Transmitter("tx", [-5., 0., 5.]))
    sc.add(Receiver("rx", [5., 1., 5.]))

    solver = PathSolver()
    p_ref = solver(sc, max_depth=1, samples_per_src=5000)
    fn, (txp, rxp, eta, scat) = solver.trace_functional(
        sc, max_depth=1, samples_per_src=5000)
    a, tau, valid = fn(txp, rxp, eta, scat)

    # Parity with the standard solver at the baked arguments
    v = np.asarray(valid)[0, 0]
    vr = np.asarray(p_ref.valid)[0, 0]
    assert v.sum() == vr.sum() == 2   # LoS + specular
    np.testing.assert_allclose(
        np.sort(np.asarray(tau)[0, 0][v]),
        np.sort(np.asarray(p_ref.tau)[0, 0][vr]), rtol=1e-6)
    np.testing.assert_allclose(
        np.sort(np.abs(np.asarray(a)[0, 0, 0, 0][v])),
        np.sort(np.abs(np.asarray(p_ref.a)[0, 0, 0, 0][vr])),
        rtol=1e-5)

    def loss(txp, rxp, eta, scat):
        a, tau, valid = fn(txp, rxp, eta, scat)
        return jnp.sum(jnp.where(valid[:, None, :, None],
                                 jnp.abs(a) ** 2, 0.))

    g_tx, g_rx, g_eta = jax.grad(loss, argnums=(0, 1, 2))(
        txp, rxp, eta, scat)
    for g in (g_tx, g_rx, g_eta):
        g = np.asarray(g)
        assert np.all(np.isfinite(g)) and np.any(g != 0)

    # Autodiff vs central finite difference on the RX x-coordinate
    eps = 1e-3
    l_p = loss(txp, rxp.at[0, 0].add(eps), eta, scat)
    l_m = loss(txp, rxp.at[0, 0].add(-eps), eta, scat)
    num = (l_p - l_m) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g_rx)[0, 0], num, rtol=2e-2)


def test_paths_cfr_and_taps():
    """Paths.cfr / Paths.taps (upstream API used by SYS_Meets_RT /
    LinkAdaptation tutorials) match direct evaluation from cir()."""
    sc = load_scene("simple_reflector", frequency=3e9)
    sc.tx_array = _iso()
    sc.rx_array = _iso()
    sc.add(Transmitter("tx", [-10., 0., 10.]))
    sc.add(Receiver("rx", [10., 0., 10.]))
    paths = PathSolver()(sc, max_depth=1, samples_per_src=20000)
    freqs = np.linspace(-0.5e6, 0.5e6, 8)
    h = paths.cfr(freqs, sampling_frequency=1e3, num_time_steps=3,
                  out_type="numpy")
    a, tau = paths.cir(sampling_frequency=1e3, num_time_steps=3,
                       out_type="numpy")
    # manual DFT over paths
    ph = np.exp(-2j * np.pi * freqs[None, :]
                * np.asarray(tau)[0, 0][:, None])  # [P, F]
    h_ref = np.einsum("pt,pf->tf", a[0, 0, 0, 0], ph)
    np.testing.assert_allclose(h, h_ref[None, None, None, None],
                               rtol=1e-5, atol=1e-12)
    assert h.shape == (1, 1, 1, 1, 3, 8)

    bw, l_min, l_max = 10e6, 0, 20
    hm = paths.taps(bw, l_min, l_max, sampling_frequency=1e3,
                    num_time_steps=2, normalize_delays=False,
                    out_type="numpy")
    a2, tau2 = paths.cir(sampling_frequency=1e3, num_time_steps=2,
                         out_type="numpy")
    lags = np.arange(l_min, l_max + 1)
    sinc = np.sinc(lags[None, :] - bw * np.asarray(tau2)[0, 0][:, None])
    hm_ref = np.einsum("pt,pl->tl", a2[0, 0, 0, 0], sinc)
    np.testing.assert_allclose(hm, hm_ref[None, None, None, None],
                               rtol=1e-5, atol=1e-12)


def test_radio_map_sample_positions_and_render_overlay():
    """RadioMap.sample_positions + Scene.render(radio_map=...) +
    scene.preview / scene.bandwidth (upstream API from
    Link_Level_Simulations_with_RT / SYS_Meets_RT)."""
    from sionna_tpu.rt import Camera
    sc = load_scene("simple_street_canyon", frequency=3.5e9)
    sc.tx_array = _iso()
    sc.rx_array = _iso()
    sc.add(Transmitter("tx", [-20., 0., 10.]))
    sc.bandwidth = 32 * 30e3
    assert sc.bandwidth == 32 * 30e3
    rm = RadioMapSolver()(sc, cell_size=(4., 4.), size=(60., 60.),
                          center=(0., 0., 1.5), max_depth=1,
                          samples_per_tx=20000)   # upstream kwarg
    pos, cells = rm.sample_positions(
        50, metric="path_gain", min_val_db=-130., max_val_db=0.,
        min_dist=5., max_dist=60., seed=3)
    assert pos.shape == (50, 3) and cells.shape == (50, 2)
    d = np.linalg.norm(pos - np.array([-20., 0., 10.]), axis=-1)
    # cell jitter can move a sample at most half a diagonal outside
    assert (d >= 5. - 3.).all() and (d <= 60. + 3.).all()
    g = np.asarray(rm.path_gain)[0, cells[:, 0], cells[:, 1]]
    db = 10 * np.log10(g)
    assert (db >= -130.).all() and (db <= 0.).all()

    cam = Camera("cam", [0., -80., 60.])
    cam.look_at([0., 0., 0.])
    sc.add(cam)
    img_plain = sc.render(camera=cam, resolution=(64, 48))
    img_rm = sc.render(camera=cam, resolution=(64, 48), radio_map=rm,
                       rm_vmin=-110., clip_at=10.)
    assert img_rm.shape == (48, 64, 3)
    assert np.isfinite(img_rm).all()
    assert not np.allclose(img_plain, img_rm)  # overlay visible
    img_prev = sc.preview(camera=cam, resolution=(64, 48))
    np.testing.assert_array_equal(img_prev, img_plain)


def test_gain_output_matches_paths_reduction():
    """PathSolver(output="gain") equals the host-side reduction of
    the full Paths output (sum_paths |a[rx,0,tx,0,p]|^2)."""
    from sionna_tpu.rt import (load_scene, Transmitter, Receiver,
                               PlanarArray, PathSolver)
    sc = load_scene("simple_street_canyon", frequency=3.5e9)
    sc.tx_array = PlanarArray(1, 1, pattern="iso", polarization="V")
    sc.rx_array = PlanarArray(1, 1, pattern="iso", polarization="V")
    sc.add(Transmitter("tx", [-20., 0., 10.]))
    sc.add(Receiver("rx0", [20., 5., 1.5]))
    sc.add(Receiver("rx1", [10., -3., 1.5]))
    solver = PathSolver()
    kw = dict(max_depth=2, samples_per_src=20000)
    paths = solver(sc, **kw)
    a = np.asarray(paths.a)[:, 0, :, 0, :]
    gain_ref = np.sum(np.abs(a) ** 2, axis=-1)       # [rx, tx]
    gain_dev = solver(sc, output="gain", **kw)
    np.testing.assert_allclose(gain_dev, gain_ref, rtol=1e-5,
                               atol=1e-24)


def test_gain_compaction_matches_full(monkeypatch):
    """The compacted gain path (valid-pair gather -> _eval_tail on
    [cap, 1, 1] -> per-cell scatter-add) must equal the full
    [S, tx, rx] evaluation (paths-based reduction).  The production
    threshold engages only above 65536 pairs, so force it to 0."""
    from sionna_tpu.rt import (load_scene, Transmitter, Receiver,
                               PlanarArray, PathSolver)
    import sionna_tpu.rt.solver as solver_mod
    monkeypatch.setattr(solver_mod, "GAIN_COMPACT_MIN_PAIRS", 0)

    sc = load_scene("simple_street_canyon", frequency=3.5e9)
    sc.tx_array = PlanarArray(1, 1, pattern="iso", polarization="V")
    sc.rx_array = PlanarArray(1, 1, pattern="iso", polarization="V")
    sc.add(Transmitter("tx", [-20., 0., 10.]))
    rng = np.random.default_rng(3)
    rx_pos = np.stack([rng.uniform(-25, 25, 40),
                       rng.uniform(-8, 8, 40),
                       np.full(40, 1.5)], axis=-1)
    for i, p in enumerate(rx_pos):
        sc.add(Receiver(f"rx{i}", p.tolist()))

    kw = dict(max_depth=2, samples_per_src=4000)
    solver = PathSolver()
    paths = solver(sc, **kw)
    a = np.asarray(paths.a)[:, 0, :, 0, :]
    gain_ref = np.sum(np.abs(a) ** 2, axis=-1)       # [rx, tx]
    gain_dev = np.asarray(solver(sc, output="gain", **kw))
    np.testing.assert_allclose(gain_dev, gain_ref, rtol=1e-5,
                               atol=1e-24)
