"""Scattering re-radiation patterns (Lambertian/directive/
backscattering).

Validates, against upstream Sionna RT semantics (SURVEY.md 2.12;
patterns per Degli-Esposti's effective-roughness model):
- every pattern integrates to 1 over the hemisphere for any incidence
  (Monte-Carlo quadrature vs the closed-form normalization),
- lobe geometry (directive peaks at the specular direction,
  backscattering at the incident direction),
- the path solver's scattered power with a directive material matches
  direct numerical quadrature of the bistatic integral.
"""

import numpy as np
import pytest

from sionna_tpu.rt import (Scene, Transmitter, Receiver, PlanarArray,
                           PathSolver, LambertianPattern,
                           DirectivePattern, BackscatteringPattern)
from sionna_tpu.rt.scattering_pattern import (lobe_norm_coeffs,
                                              eval_lobe_norm)


def _hemisphere_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.random(n)
    phi = 2 * np.pi * rng.random(n)
    cos_t = u                     # uniform on the hemisphere
    sin_t = np.sqrt(1. - cos_t ** 2)
    return np.stack([sin_t * np.cos(phi), sin_t * np.sin(phi),
                     cos_t], -1).astype(np.float32)


def _k_i(theta_i):
    """Incident direction (towards the surface, normal +z)."""
    return np.array([np.sin(theta_i), 0., -np.cos(theta_i)],
                    np.float32)


@pytest.mark.parametrize("pattern", [
    LambertianPattern(),
    DirectivePattern(1),
    DirectivePattern(4),
    DirectivePattern(11),
    BackscatteringPattern(3, 7, lambda_=0.3),
])
@pytest.mark.parametrize("theta_deg", [0., 35., 60., 80.])
def test_pattern_integrates_to_one(pattern, theta_deg):
    n_mc = 200_000
    k_s = _hemisphere_dirs(n_mc, seed=1)
    k_i = np.broadcast_to(_k_i(np.radians(theta_deg)), (n_mc, 3))
    n = np.broadcast_to(np.array([0., 0., 1.], np.float32),
                        (n_mc, 3))
    f = np.asarray(pattern(k_i, k_s, n))
    integral = 2. * np.pi * float(np.mean(f))
    assert abs(integral - 1.) < 0.02, (pattern, theta_deg, integral)


def test_lobe_norm_closed_form_vs_quadrature():
    """F_alpha(theta_i) coefficients vs brute-force quadrature of the
    unnormalized lobe."""
    for alpha in (1, 2, 3, 6, 9):
        a_const, b = lobe_norm_coeffs(alpha)
        for theta in (0.2, 0.9, 1.4):
            t = (np.arange(1500) + 0.5) * (np.pi / 2 / 1500)
            p = (np.arange(1500) + 0.5) * (2 * np.pi / 1500)
            tt, pp = np.meshgrid(t, p)
            k_s = np.stack([np.sin(tt) * np.cos(pp),
                            np.sin(tt) * np.sin(pp), np.cos(tt)], -1)
            k_r = np.array([np.sin(theta), 0., np.cos(theta)])
            cos_psi = np.clip(k_s @ k_r, -1., 1.)
            lobe = ((1. + cos_psi) / 2.) ** alpha
            integ = np.sum(lobe * np.sin(tt)) * (t[1] - t[0]) \
                * (p[1] - p[0])
            closed = float(eval_lobe_norm(a_const, b,
                                          np.float32(np.cos(theta))))
            assert abs(integ - closed) / closed < 1e-3, \
                (alpha, theta, integ, closed)


def test_lobe_geometry():
    theta = np.radians(40.)
    k_i = _k_i(theta)
    n = np.array([0., 0., 1.], np.float32)
    k_spec = k_i - 2 * (k_i @ n) * n
    dirs = _hemisphere_dirs(50_000, seed=2)
    f_dir = np.asarray(DirectivePattern(8)(k_i, dirs, n))
    assert np.allclose(dirs[np.argmax(f_dir)], k_spec, atol=0.05)
    f_back = np.asarray(
        BackscatteringPattern(8, 8, lambda_=0.)(k_i, dirs, n))
    assert np.allclose(dirs[np.argmax(f_back)], -k_i, atol=0.05)
    # lambda_=1 backscattering == directive
    f_b1 = np.asarray(
        BackscatteringPattern(8, 8, lambda_=1.)(k_i, dirs, n))
    assert np.allclose(f_b1, f_dir, rtol=1e-5, atol=1e-7)


def _plate_scene(freq, mats=("itu_metal", "itu_metal"), half=10.):
    v = [np.array([-half, -half, 0.]), np.array([half, -half, 0.]),
         np.array([half, half, 0.]), np.array([-half, half, 0.])]
    tris = np.stack([np.stack([v[0], v[1], v[2]]),
                     np.stack([v[0], v[2], v[3]])]).astype(np.float64)
    sc = Scene(triangles=tris, material_names=list(mats),
               frequency=freq)
    sc.tx_array = PlanarArray(1, 1, pattern="iso", polarization="V")
    sc.rx_array = PlanarArray(1, 1, pattern="iso", polarization="V")
    return sc


def test_solver_directive_scattering_vs_quadrature():
    """Scattered power from a rough metal plate with a directive
    pattern: solver Monte-Carlo vs numerical quadrature of
    (lam/4pi)^2 cos_i f(k_i,k_s) / (r1^2 r2^2) dA."""
    freq = 3.5e9
    lam = 299792458. / freq
    half = 10.
    pattern = DirectivePattern(3)
    sc = _plate_scene(freq, half=half)
    for m in sc.radio_materials.values():
        m.scattering_coefficient = 1.0
        m.scattering_pattern = pattern
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

    g = np.linspace(-half, half, 400)
    xg, yg = np.meshgrid(g, g)
    pq = np.stack([xg, yg, np.zeros_like(xg)], -1).reshape(-1, 3)
    r1v = pq - tx
    r2v = rx - pq
    r1 = np.linalg.norm(r1v, axis=1)
    r2 = np.linalg.norm(r2v, axis=1)
    cos_i = np.abs(r1v[:, 2]) / r1
    k_i = (r1v / r1[:, None]).astype(np.float32)
    k_s = (r2v / r2[:, None]).astype(np.float32)
    n = np.broadcast_to(np.array([0., 0., 1.], np.float32),
                        k_i.shape)
    f = np.asarray(pattern(k_i, k_s, n))
    da = (g[1] - g[0]) ** 2
    p_ref = ((lam / (4 * np.pi)) ** 2
             * np.sum(cos_i * f / (r1 ** 2 * r2 ** 2)) * da)
    assert abs(p_mc - p_ref) / p_ref < 0.15, (p_mc, p_ref)


def test_mixed_materials_batch():
    """Plate with two different patterns on its two triangles solves
    and produces finite scattered paths (mixed-material gather
    path)."""
    freq = 3.5e9
    sc = _plate_scene(freq, mats=("itu_metal", "itu_concrete"))
    for m in sc.radio_materials.values():
        m.scattering_coefficient = 0.8
    sc.get("itu_metal").scattering_pattern = DirectivePattern(4)
    sc.get("itu_concrete").scattering_pattern = \
        BackscatteringPattern(2, 5, lambda_=0.4)
    sc.add(Transmitter("tx", [-5., 0., 10.]))
    sc.add(Receiver("rx", [6., 2., 8.]))
    paths = PathSolver()(sc, max_depth=0, los=False,
                         specular_reflection=False,
                         diffuse_reflection=True,
                         diffuse_samples=4000, seed=5)
    a = np.asarray(paths.cir(out_type="numpy")[0])
    assert np.isfinite(a).all()
    assert float(np.sum(np.abs(a) ** 2)) > 0.


def test_rx_behind_surface_no_nan():
    """RX on the back side of the scattering plate: cos(theta_s) < 0
    for every sample, so the paths are invalid — the CIR must be
    all-zero, never NaN (regression: negative a2 under the Lambertian
    fast path fed sqrt, and NaN*0 survived the valid mask)."""
    freq = 3.5e9
    sc = _plate_scene(freq)
    for m in sc.radio_materials.values():
        m.scattering_coefficient = 1.0
    sc.add(Transmitter("tx", [-5., 0., 10.]))
    sc.add(Receiver("rx", [0., 0., -8.]))
    paths = PathSolver()(sc, max_depth=0, los=False,
                         specular_reflection=False,
                         diffuse_reflection=True,
                         diffuse_samples=2000, seed=7)
    a = np.asarray(paths.cir(out_type="numpy")[0])
    assert np.isfinite(a).all()
    assert float(np.sum(np.abs(a) ** 2)) == 0.


def test_rx_behind_surface_no_nan_directive():
    """Same back-side regression through the mixed-material directive
    branch (cos_s clipping in the is_lamb where)."""
    freq = 3.5e9
    sc = _plate_scene(freq, mats=("itu_metal", "itu_concrete"))
    for m in sc.radio_materials.values():
        m.scattering_coefficient = 1.0
    sc.get("itu_concrete").scattering_pattern = DirectivePattern(4)
    sc.add(Transmitter("tx", [-5., 0., 10.]))
    sc.add(Receiver("rx", [0., 0., -8.]))
    paths = PathSolver()(sc, max_depth=0, los=False,
                         specular_reflection=False,
                         diffuse_reflection=True,
                         diffuse_samples=2000, seed=7)
    a = np.asarray(paths.cir(out_type="numpy")[0])
    assert np.isfinite(a).all()
    assert float(np.sum(np.abs(a) ** 2)) == 0.
