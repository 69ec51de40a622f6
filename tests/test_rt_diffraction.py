"""Validation of UTD wedge diffraction and diffuse scattering.

Analytic anchors:
- wedge extraction geometry (exterior angles, frames)
- Fresnel transition function vs a SciPy oracle
- Keller cone condition at the closed-form diffraction point
- shadow-boundary continuity of the total (GO + diffracted) field
  behind a conducting screen — the defining property of UTD
- deep-shadow field vs an independent NumPy UTD oracle
- diffuse scattering energy vs numeric surface integration
"""

import numpy as np

from sionna_tpu.rt import (load_scene, Transmitter, Receiver,
                           PlanarArray, PathSolver)
from sionna_tpu.rt.scene import Scene, _quad
from sionna_tpu.rt.diffraction import (extract_wedges,
                                       fresnel_transition)


def _iso_scene(tris, mats, frequency=3.5e9):
    sc = Scene(triangles=np.asarray(tris), material_names=mats,
               frequency=frequency)
    sc.tx_array = PlanarArray(1, 1, pattern="iso", polarization="V")
    sc.rx_array = PlanarArray(1, 1, pattern="iso", polarization="V")
    return sc


def _screen_scene(frequency=3.5e9, half_width=200., top=20.):
    """A vertical metal screen in the x=0 plane from z=0 to ``top``;
    its top edge (along y at z=top) is the knife edge."""
    tris = _quad([0., -half_width, 0.], [0., half_width, 0.],
                 [0., half_width, top], [0., -half_width, top])
    return _iso_scene(tris, ["itu_metal"] * 2, frequency)


# --------------------------------------------------------------- #
# Wedge extraction
# --------------------------------------------------------------- #

def test_extract_wedges_right_angle():
    """The simple_wedge scene (two perpendicular plates) must yield a
    90-degree interior wedge (n = 1.5) along the shared edge plus
    screen edges (n = 2) on the free boundaries."""
    sc = load_scene("simple_wedge")
    w = extract_wedges(sc.triangles)
    n_vals = np.round(w["n_angle"] / np.pi, 3)
    assert 1.5 in n_vals          # the 90-degree corner
    assert 2.0 in n_vals          # free plate boundaries
    # frames are orthonormal
    for k in ("e_hat", "x_hat", "y_hat"):
        np.testing.assert_allclose(
            np.linalg.norm(w[k], axis=1), 1., atol=1e-9)
    dot_ex = np.abs(np.sum(w["e_hat"] * w["x_hat"], axis=1))
    np.testing.assert_allclose(dot_ex, 0., atol=1e-9)


def test_extract_wedges_box_is_all_convex():
    """A closed box has 12 corner edges, all convex (n = 1.5); the
    coplanar quad diagonals must not appear."""
    sc = load_scene("box")
    w = extract_wedges(sc.triangles)
    np.testing.assert_allclose(w["n_angle"] / np.pi, 1.5, atol=1e-6)
    # 12 box edges, possibly split by triangulation
    total_len = w["length"].sum()
    assert abs(total_len - (4 * 10 + 4 * 10 + 4 * 3) * 1.0) < 1e-6


# --------------------------------------------------------------- #
# Fresnel transition function
# --------------------------------------------------------------- #

def test_fresnel_transition_oracle():
    """F(x) against direct SciPy Fresnel-integral evaluation."""
    from scipy.special import fresnel as sp_fresnel
    x = np.linspace(1e-4, 20., 500)
    u = np.sqrt(2. * x / np.pi)
    s, c = sp_fresnel(u)          # scipy returns (S, C)
    integral = np.sqrt(np.pi / 2.) * ((0.5 - c) - 1j * (0.5 - s))
    ref = 2j * np.sqrt(x) * np.exp(1j * x) * integral
    got = np.asarray(fresnel_transition(x))
    np.testing.assert_allclose(got, ref, atol=6e-3)
    # asymptotics
    assert abs(np.asarray(fresnel_transition(50.)) - 1.) < 0.02
    small = np.asarray(fresnel_transition(1e-6))
    assert abs(small) < 5e-3


# --------------------------------------------------------------- #
# Diffraction paths
# --------------------------------------------------------------- #

def test_keller_cone_and_delay():
    """The diffraction point satisfies the Keller cone condition
    (equal angles with the edge) and minimizes the path length."""
    sc = _screen_scene()
    tx = np.array([-30., 10., 5.])
    rx = np.array([40., -20., 3.])
    sc.add(Transmitter("tx", tx))
    sc.add(Receiver("rx", rx))
    paths = PathSolver()(sc, max_depth=0, los=False,
                         specular_reflection=False, diffraction=True)
    valid = np.asarray(paths.valid)[0, 0]
    assert valid.sum() >= 1
    tau = np.asarray(paths.tau)[0, 0]
    tau_d = tau[valid].min()
    # oracle: brute-force minimum over all four screen edges (the
    # global optimum rounds the bottom edge for this geometry)
    c = 299792458.
    d_best = np.inf
    for qgen in (
        lambda s: np.stack([0 * s, s, 0 * s + 20.], -1),   # top
        lambda s: np.stack([0 * s, s, 0 * s], -1),          # bottom
        lambda s: np.stack([0 * s, 0 * s - 200., s / 10.], -1),
        lambda s: np.stack([0 * s, 0 * s + 200., s / 10.], -1),
    ):
        s = np.linspace(-200., 200., 400001)
        q = qgen(s)
        d = (np.linalg.norm(q - tx, axis=1)
             + np.linalg.norm(rx - q, axis=1))
        d_best = min(d_best, d.min())
    assert abs(tau_d * c - d_best) < 1e-3


def test_shadow_boundary_continuity():
    """Scanning an RX through the shadow boundary behind a screen,
    the total field must stay continuous (no GO jump): the diffracted
    field supplies half the LoS field at the boundary."""
    freq = 3.5e9
    sc = _screen_scene(freq)
    tx = np.array([-50., 0., 10.])
    sc.add(Transmitter("tx", tx))
    # shadow boundary behind the screen: ray tx -> edge (0, 0, 20)
    # continues to z = 20 + (20-10) = 30 at x = 50
    zs = np.linspace(24., 36., 41)
    for i, z in enumerate(zs):
        sc.add(Receiver(f"rx{i}", [50., 0., float(z)]))
    paths = PathSolver()(sc, max_depth=0, los=True,
                         specular_reflection=False, diffraction=True)
    a = np.asarray(paths.cir(out_type="numpy")[0])[:, 0, 0, 0, :, 0]
    total = np.abs(a.sum(axis=1))          # coherent sum per rx
    # fields on a fine grid: no adjacent-sample jump > 25% of the
    # incident field (GO alone would jump by 100% at the boundary)
    fs = total / np.median(total[-5:])
    jumps = np.abs(np.diff(fs))
    assert jumps.max() < 0.35, f"max jump {jumps.max():.3f}"
    # deep shadow is monotonically weaker than lit region
    assert total[0] < 0.35 * total[-1]


def test_deep_shadow_vs_utd_oracle():
    """Field deep in the shadow of a metal screen vs an independent
    NumPy evaluation of the PEC half-plane UTD coefficient."""
    from scipy.special import fresnel as sp_fresnel
    freq = 3.5e9
    lam = 299792458. / freq
    sc = _screen_scene(freq)
    tx = np.array([-50., 0., 10.])
    rx = np.array([50., 0., -5.])          # deep shadow
    sc.add(Transmitter("tx", tx))
    sc.add(Receiver("rx", rx))
    paths = PathSolver()(sc, max_depth=0, los=True,
                         specular_reflection=False, diffraction=True)
    a = np.asarray(paths.cir(out_type="numpy")[0])[0, 0, 0, 0, :, 0]
    tau = np.asarray(paths.tau)[0, 0]

    # oracle: PEC half-plane (n=2) for the TOP edge specifically (the
    # bottom/side edges produce their own, separately delayed paths)
    edge = np.array([0., 0., 20.])
    # diffraction point: by symmetry at y=0
    sp = np.linalg.norm(edge - tx)
    s = np.linalg.norm(rx - edge)
    idx = np.argmin(np.abs(tau - (sp + s) / 299792458.))
    assert abs(tau[idx] * 299792458. - (sp + s)) < 1e-3
    got = np.abs(a[idx])
    k = 2 * np.pi / lam
    # angles from the 0-face (screen occupies z<20 in the x=0 plane;
    # faces at phi=0 and phi=2pi): measure from -z direction
    phi_p = np.arctan2(abs(tx[0]), 20. - tx[2])  # from screen plane
    phi_p = np.pi - np.arctan2(20. - tx[2], -tx[0]) if False else phi_p
    # use explicit geometry: incident direction projected angle from
    # the face tangent (0, 0, -1):
    u_in = (edge - tx); u_in = u_in / np.linalg.norm(u_in)
    t0 = np.array([0., 0., -1.])
    y0 = np.array([-1., 0., 0.])           # exterior of 0-face
    b_in = -u_in
    phi_p = np.arctan2(b_in @ y0, b_in @ t0) % (2 * np.pi)
    u_out = (rx - edge); u_out = u_out / np.linalg.norm(u_out)
    phi = np.arctan2(u_out @ y0, u_out @ t0) % (2 * np.pi)
    n = 2.
    L = s * sp / (s + sp)

    def F(x):
        u = np.sqrt(2 * x / np.pi)
        ss, cc = sp_fresnel(u)
        integ = np.sqrt(np.pi / 2) * ((0.5 - cc) - 1j * (0.5 - ss))
        return 2j * np.sqrt(x) * np.exp(1j * x) * integ

    def cot_term(beta, sign):
        big_n = np.round((sign * beta + np.pi) / (2 * n * np.pi))
        a_par = 2 * np.cos((2 * n * np.pi * big_n - sign * beta)
                           / 2) ** 2
        return (1. / np.tan((np.pi + sign * beta) / (2 * n))
                * F(k * L * a_par))

    pref = -np.exp(-1j * np.pi / 4) / (2 * n * np.sqrt(2 * np.pi * k))
    bm, bp = phi - phi_p, phi + phi_p
    t12 = cot_term(bm, +1) + cot_term(bm, -1)
    t34 = cot_term(bp, -1) + cot_term(bp, +1)
    d_soft = pref * (t12 - t34)
    d_hard = pref * (t12 + t34)
    spread = np.sqrt(1. / (s * sp * (s + sp)))
    amp_s = lam / (4 * np.pi) * abs(d_soft) * spread
    amp_h = lam / (4 * np.pi) * abs(d_hard) * spread
    # the V-pol iso antenna on this geometry excites the soft
    # component; match within 5%
    best = min(abs(got - amp_s) / amp_s, abs(got - amp_h) / max(
        amp_h, 1e-30))
    assert best < 0.05, (got, amp_s, amp_h)


def test_diffraction_into_lit_region_small():
    """In the lit region far from any boundary the diffracted field
    must be much weaker than LoS."""
    sc = _screen_scene()
    sc.add(Transmitter("tx", [-50., 0., 40.]))
    sc.add(Receiver("rx", [50., 0., 40.]))   # LoS far above screen
    paths = PathSolver()(sc, max_depth=0, los=True,
                         specular_reflection=False, diffraction=True)
    a = np.asarray(paths.cir(out_type="numpy")[0])[0, 0, 0, 0, :, 0]
    p = np.abs(a) ** 2
    p_sorted = np.sort(p)[::-1]
    assert p_sorted[0] > 30. * p_sorted[1:].sum()


# --------------------------------------------------------------- #
# Diffuse scattering
# --------------------------------------------------------------- #

def test_diffuse_energy_vs_quadrature():
    """Monte-Carlo scattered power from a fully rough metal plate vs
    direct numerical quadrature of the bistatic scattering
    integral."""
    freq = 3.5e9
    lam = 299792458. / freq
    half = 10.
    tris = _quad([-half, -half, 0.], [half, -half, 0.],
                 [half, half, 0.], [-half, half, 0.])
    sc = _iso_scene(tris, ["itu_metal"] * 2, freq)
    for m in sc.radio_materials.values():
        m.scattering_coefficient = 1.0
    tx = np.array([-5., 0., 10.])
    rx = np.array([6., 2., 8.])
    sc.add(Transmitter("tx", tx))
    sc.add(Receiver("rx", rx))
    paths = PathSolver()(sc, max_depth=0, los=False,
                         specular_reflection=False,
                         diffuse_reflection=True,
                         diffuse_samples=20000, seed=3)
    a = np.asarray(paths.cir(out_type="numpy")[0])[0, 0, 0, 0, :, 0]
    p_mc = float(np.sum(np.abs(a) ** 2))

    # quadrature of (lam/4pi)^2 cos_i cos_s / (pi r1^2 r2^2) dA
    g = np.linspace(-half, half, 400)
    xg, yg = np.meshgrid(g, g)
    pq = np.stack([xg, yg, np.zeros_like(xg)], -1).reshape(-1, 3)
    r1v = pq - tx
    r2v = rx - pq
    r1 = np.linalg.norm(r1v, axis=1)
    r2 = np.linalg.norm(r2v, axis=1)
    cos_i = np.abs(r1v[:, 2]) / r1
    cos_s = np.abs(r2v[:, 2]) / r2
    da = (g[1] - g[0]) ** 2
    p_ref = ((lam / (4 * np.pi)) ** 2
             * np.sum(cos_i * cos_s / (np.pi * r1 ** 2 * r2 ** 2))
             * da)
    assert abs(p_mc - p_ref) / p_ref < 0.15, (p_mc, p_ref)


def test_diffuse_requires_scattering_coefficient():
    """With S = 0 everywhere, diffuse_reflection adds no paths."""
    sc = _screen_scene()
    sc.add(Transmitter("tx", [-30., 0., 10.]))
    sc.add(Receiver("rx", [30., 0., 10.]))
    p0 = PathSolver()(sc, max_depth=0, los=True,
                      specular_reflection=False)
    p1 = PathSolver()(sc, max_depth=0, los=True,
                      specular_reflection=False,
                      diffuse_reflection=True)
    assert p1.num_paths == p0.num_paths


def test_energy_split_specular_plus_diffuse():
    """sqrt(1-S^2) specular reduction: the specular reflection power
    scales by (1-S^2) when S is set."""
    freq = 3.5e9
    tris = _quad([-50., -50., 0.], [50., -50., 0.],
                 [50., 50., 0.], [-50., 50., 0.])

    def refl_power(s_coef):
        sc = _iso_scene(tris, ["itu_metal"] * 2, freq)
        for m in sc.radio_materials.values():
            m.scattering_coefficient = s_coef
        sc.add(Transmitter("tx", [-10., 0., 10.]))
        sc.add(Receiver("rx", [10., 0., 10.]))
        paths = PathSolver()(sc, max_depth=1, los=False,
                             specular_reflection=True)
        a = np.asarray(paths.cir(out_type="numpy")[0])
        return float(np.sum(np.abs(a) ** 2))

    p_smooth = refl_power(0.0)
    p_rough = refl_power(0.6)
    np.testing.assert_allclose(p_rough / p_smooth, 1 - 0.6 ** 2,
                               rtol=1e-3)


def test_multi_tx_rx_with_all_interactions():
    """Two TX and two RX with LoS + reflections + diffraction +
    scattering: exercises the [paths, tx, rx] broadcasting of every
    eval stage; symmetric geometry gives symmetric strongest paths,
    and paths.types labels each interaction kind."""
    # rough ground plane + a small central metal screen: every
    # interaction type contributes on every link (LoS clears the
    # screen at |y| = 10, the ground bounce reflects, the screen
    # edges diffract, the rough ground scatters)
    tris = _quad([-60., -60., 0.], [60., -60., 0.],
                 [60., 60., 0.], [-60., 60., 0.])
    tris += _quad([0., -5., 0.], [0., 5., 0.],
                  [0., 5., 15.], [0., -5., 15.])
    sc = _iso_scene(tris, ["itu_concrete"] * 2 + ["itu_metal"] * 2)
    sc.get("itu_concrete").scattering_coefficient = 0.5
    sc.add(Transmitter("tx0", [-30., -10., 10.]))
    sc.add(Transmitter("tx1", [-30., 10., 10.]))
    sc.add(Receiver("rx0", [30., -10., 5.]))
    sc.add(Receiver("rx1", [30., 10., 5.]))
    paths = PathSolver()(sc, max_depth=1, samples_per_src=2000,
                         diffraction=True, diffuse_reflection=True,
                         diffuse_samples=512, seed=9)
    a = np.asarray(paths.a)          # [rx, ra, tx, ta, P]
    valid = np.asarray(paths.valid)  # [rx, tx, P]
    assert a.shape[0] == 2 and a.shape[2] == 2
    # every link has paths (diffraction around the screen at least)
    assert (valid.sum(axis=-1) >= 1).all()
    types = np.asarray(paths.types)
    assert types.shape == (paths.num_paths,)
    present = {int(t) for t in np.unique(
        np.broadcast_to(types, valid.shape)[valid])}
    assert 2 in present                # diffraction present
    assert 3 in present                # scattering present
    # mirror symmetry in y: strongest path power of (rx0, tx0)
    # matches (rx1, tx1), and (rx0, tx1) matches (rx1, tx0)
    p = np.abs(a[:, 0, :, 0, :]) ** 2     # [rx, tx, P]
    strongest = p.max(axis=-1)
    np.testing.assert_allclose(strongest[0, 0], strongest[1, 1],
                               rtol=1e-3)
    np.testing.assert_allclose(strongest[0, 1], strongest[1, 0],
                               rtol=1e-3)


def test_diffracted_path_oblique_transmission_te_tm():
    """Polarimetric through-blocker transmission on a DIFFRACTED
    path: a concrete wall crosses the incident segment at ~63 deg
    from its normal, so a V-polarized link (E in the x-z propagation
    plane = TM for the x-normal wall) must be attenuated by t_TM and
    an H-polarized link (E along y = TE) by t_TE — not by the
    polarization-averaged scalar.  Oracle: the ITU slab coefficients
    at the exact crossing angle, measured as the amplitude ratio
    against the identical blocker-free scene (round-4 closure of the
    PARITY.md 'diffracted/scattered transmission is polarization-
    averaged' gap; upstream applies the full Jones cascade on every
    path segment)."""
    freq = 3e9
    c = 299792458.
    lam = c / freq
    tx = np.array([-10., 0., 0.])
    rx = np.array([30., 0., 3.])
    q = np.array([0., 0., 20.])           # top-edge diffraction point
    tau_want = (np.linalg.norm(q - tx) + np.linalg.norm(rx - q)) / c

    def build(with_blocker, pol):
        tris = _quad([0., -200., 0.], [0., 200., 0.],
                     [0., 200., 20.], [0., -200., 20.])
        mats = ["itu_metal"] * 2
        if with_blocker:
            tris = tris + _quad([-5., -50., 2.], [-5., 50., 2.],
                                [-5., 50., 40.], [-5., -50., 40.])
            mats = mats + ["itu_concrete"] * 2
        sc = _iso_scene(tris, mats, frequency=freq)
        sc.tx_array = PlanarArray(1, 1, pattern="iso",
                                  polarization=pol)
        sc.rx_array = PlanarArray(1, 1, pattern="iso",
                                  polarization=pol)
        sc.add(Transmitter("tx", tx.tolist()))
        sc.add(Receiver("rx", rx.tolist()))
        return sc

    def top_edge_amp(sc):
        p = PathSolver()(sc, max_depth=0, los=False,
                         specular_reflection=False, diffraction=True,
                         refraction=True)
        tau = np.asarray(p.tau)[0, 0]
        valid = np.asarray(p.valid)[0, 0]
        tau = np.where(valid, tau, np.inf)
        idx = int(np.argmin(np.abs(tau - tau_want)))
        assert abs(tau[idx] - tau_want) * c < 1e-3
        return np.asarray(p.a)[0, 0, 0, 0, idx]

    ratios = {}
    for pol in ("V", "H"):
        a_blk = top_edge_amp(build(True, pol))
        a_free = top_edge_amp(build(False, pol))
        ratios[pol] = abs(a_blk) / abs(a_free)

    # oracle: slab coefficients at the actual crossing angle of the
    # incident segment with the x-normal wall
    d1 = q - tx
    cos_i = abs(d1[0]) / np.linalg.norm(d1)
    sc_m = build(True, "V")
    mat = [m for m in sc_m.triangle_materials
           if "concrete" in m.name][0]
    eta = mat.complex_relative_permittivity(freq)
    sin2 = 1. - cos_i ** 2
    root = np.sqrt(eta - sin2)
    r_te = (cos_i - root) / (cos_i + root)
    r_tm = (eta * cos_i - root) / (eta * cos_i + root)
    qq = 2. * np.pi * mat.thickness / lam * root
    corr = np.exp(1j * 2. * np.pi * mat.thickness / lam * cos_i)

    def slab(r):
        e1 = np.exp(-1j * qq)
        return (1. - r ** 2) * e1 / (1. - r ** 2 * e1 * e1) * corr

    t_te, t_tm = slab(r_te), slab(r_tm)
    # the TE/TM split is material at 63 deg — the old polarization-
    # averaged scalar could not reproduce both links
    assert abs(abs(t_te) - abs(t_tm)) / abs(t_te) > 0.05
    np.testing.assert_allclose(ratios["V"], np.abs(t_tm), rtol=2e-3)
    np.testing.assert_allclose(ratios["H"], np.abs(t_te), rtol=2e-3)
