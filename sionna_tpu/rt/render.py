"""Scene rendering (API parity with sionna.rt's Camera/render
surface, SURVEY.md 2.12; fresh implementation).

A minimal ray-cast renderer on the same dense chunked
Moller-Trumbore intersector as the path solver: pinhole camera rays,
Lambertian shading from a fixed sky light, per-material albedo,
device markers.  Runs as one jitted program per (scene, resolution).
"""

import hashlib

import numpy as np

import jax
import jax.numpy as jnp

from .accel import build_accel
from .solver import (nearest_hit, _tri_normals, _rot_matrix,
                     _host_real_dtype, ACCEL_MIN_TRIS)

__all__ = ["render"]

_SKY = np.array([0.72, 0.82, 0.92])
_RENDER_CACHE = {}


def _material_albedo(name):
    """Deterministic pleasant albedo per material name."""
    h = int(hashlib.blake2b(name.encode(),
                            digest_size=4).hexdigest(), 16)
    rng = np.random.default_rng(h)
    base = 0.35 + 0.5 * rng.random(3)
    if "metal" in name:
        base = np.array([0.62, 0.64, 0.70])
    elif "concrete" in name:
        base = np.array([0.62, 0.60, 0.57])
    elif "ground" in name or "wood" in name:
        base = np.array([0.45, 0.38, 0.30])
    elif "glass" in name:
        base = np.array([0.55, 0.68, 0.75])
    return base


def render(scene, camera=None, resolution=(320, 240), fov=45.,
           light_dir=(0.35, -0.25, 0.9), radio_map=None,
           rm_metric="path_gain", rm_vmin=None, rm_vmax=None,
           rm_tx=0, clip_at=None):
    """Renders the scene from ``camera`` (or the first registered
    camera) to an RGB image [h, w, 3] in [0, 1].

    Transmitters render as red markers, receivers as green ones
    (billboard spheres of ~1% of the scene diagonal).  ``radio_map``
    overlays a RadioMap's metric (dB colormap between ``rm_vmin`` /
    ``rm_vmax``) on its measurement plane; ``clip_at`` removes all
    triangles whose centroid is above that height [m] (upstream
    Scene.render semantics for looking into street canyons)."""
    if camera is None:
        if not scene.cameras:
            raise ValueError("The scene has no camera; add one or "
                             "pass camera=")
        camera = next(iter(scene.cameras.values()))
    w, h = int(resolution[0]), int(resolution[1])
    rd = _host_real_dtype()

    # pinhole rays in the camera frame (+x forward, y left, z up)
    rot = _rot_matrix(np.asarray(camera.orientation, np.float64))
    tan = np.tan(np.deg2rad(fov) / 2.)
    ys = np.linspace(tan, -tan, w)                  # image x -> -y
    zs = np.linspace(tan * h / w, -tan * h / w, h)  # image y -> -z
    yg, zg = np.meshgrid(ys, zs)                    # [h, w]
    d_cam = np.stack([np.ones_like(yg), yg, zg], axis=-1)
    d_world = d_cam @ rot.T
    d_world /= np.linalg.norm(d_world, axis=-1, keepdims=True)
    orig = np.broadcast_to(np.asarray(camera.position, np.float64),
                           d_world.shape)

    tri_np = np.asarray(scene.triangles)
    mats = scene.triangle_materials if tri_np.shape[0] else []
    albedo = np.stack([_material_albedo(m.name) for m in mats]) \
        if tri_np.shape[0] else np.zeros((1, 3))
    if clip_at is not None and tri_np.shape[0]:
        keep = tri_np.mean(axis=1)[:, 2] <= float(clip_at)
        tri_np = tri_np[keep]
        albedo = albedo[keep] if albedo.shape[0] == keep.shape[0] \
            else albedo
    has_geometry = tri_np.shape[0] > 0

    # Radio-map overlay: precompute the dB image over the rm grid
    rm_cells = rm_img = None
    if radio_map is not None:
        if rm_metric == "path_gain":
            val = np.asarray(radio_map.path_gain)[rm_tx]
        elif rm_metric == "rss":
            val = np.asarray(radio_map.rss)[rm_tx]
        elif rm_metric == "sinr":
            val = np.asarray(radio_map.sinr)
        else:
            raise ValueError(f"Unknown rm_metric {rm_metric!r}")
        db = 10. * np.log10(np.maximum(val, 1e-30))
        lo_db = (np.percentile(db[np.isfinite(db)], 5.)
                 if rm_vmin is None else float(rm_vmin))
        hi_db = (db.max() if rm_vmax is None else float(rm_vmax))
        t = np.clip((db - lo_db) / max(hi_db - lo_db, 1e-9), 0., 1.)
        # viridis-like 3-stop ramp (dark blue -> teal -> yellow)
        stops = np.array([[0.27, 0.0, 0.33], [0.13, 0.57, 0.55],
                          [0.99, 0.91, 0.14]])
        seg = np.clip(t * 2., 0., 2.)
        c0 = stops[np.minimum(seg.astype(int), 1)]
        c1 = stops[np.minimum(seg.astype(int) + 1, 2)]
        frac = (seg - np.floor(np.minimum(seg, 1.9999)))[..., None]
        rm_img = c0 + frac * (c1 - c0)       # [ny, nx, 3]
        rm_img = np.where((db <= lo_db)[..., None], _SKY * 0. + 0.15,
                          rm_img)
        rm_cells = np.asarray(radio_map.cell_centers)  # [ny, nx, 3]

    # device markers as billboard spheres
    if has_geometry:
        lo = tri_np.reshape(-1, 3).min(0)
        hi = tri_np.reshape(-1, 3).max(0)
        marker_r = max(float(np.linalg.norm(hi - lo)) * 0.008, 0.25)
    else:
        marker_r = 0.5
    markers = []
    for t in scene.transmitters.values():
        markers.append((np.asarray(t.position), [0.85, 0.15, 0.1]))
    for r in scene.receivers.values():
        markers.append((np.asarray(r.position), [0.1, 0.7, 0.2]))

    fp = hashlib.blake2b(digest_size=16)
    fp.update(tri_np.tobytes())
    fp.update(albedo.tobytes())
    for p, c in markers:
        fp.update(p.tobytes())
        fp.update(np.asarray(c).tobytes())
    fp.update(repr((w, h, fov, tuple(light_dir),
                    tuple(camera.position),
                    tuple(camera.orientation), clip_at)).encode())
    if rm_img is not None:
        fp.update(rm_img.tobytes())
        fp.update(rm_cells.tobytes())
    key = fp.hexdigest()

    jitted = _RENDER_CACHE.get(key)
    if jitted is None:
        tri = jnp.asarray(tri_np.astype(rd))
        normals = _tri_normals(tri) if has_geometry else None
        accel = (build_accel(tri_np.astype(rd))
                 if tri_np.shape[0] >= ACCEL_MIN_TRIS else None)
        alb = jnp.asarray(albedo.astype(rd))
        light = np.asarray(light_dir, np.float64)
        light = jnp.asarray((light / np.linalg.norm(light)
                             ).astype(rd))

        def prog(o, d):
            o = o.reshape(-1, 3)
            d = d.reshape(-1, 3)
            if has_geometry:
                t_min, idx, hit = nearest_hit(o, d, tri, accel=accel)
                n = normals[idx]
                n = jnp.where(
                    jnp.sum(n * d, -1, keepdims=True) > 0, -n, n)
                lam = jnp.abs(jnp.sum(n * light, -1))
                shade = (0.35 + 0.65 * lam)[:, None] * alb[idx]
            else:
                t_min = jnp.full((o.shape[0],), jnp.inf, o.dtype)
                hit = jnp.zeros((o.shape[0],), bool)
                shade = jnp.zeros((o.shape[0], 3), o.dtype)
            img = jnp.where(hit[:, None], shade,
                            jnp.asarray(_SKY.astype(np.float64)
                                        .astype(o.dtype)))
            depth = jnp.where(hit, t_min, jnp.inf)
            # ray-sphere tests for device markers
            for p, c in markers:
                pc = jnp.asarray(p.astype(np.float64).astype(o.dtype))
                oc = o - pc
                b = jnp.sum(oc * d, -1)
                disc = b ** 2 - (jnp.sum(oc * oc, -1) - marker_r ** 2)
                t_hit = -b - jnp.sqrt(jnp.maximum(disc, 0.))
                m_hit = (disc > 0.) & (t_hit > 0.) & (t_hit < depth)
                img = jnp.where(m_hit[:, None],
                                jnp.asarray(np.asarray(c, np.float64)
                                            .astype(o.dtype)), img)
                depth = jnp.where(m_hit, t_hit, depth)
            if rm_img is not None:
                # semi-transparent overlay on the measurement plane
                ny, nx = rm_img.shape[:2]
                z0 = float(rm_cells[0, 0, 2])
                x0 = float(rm_cells[0, 0, 0])
                y0 = float(rm_cells[0, 0, 1])
                dx = (float(rm_cells[0, -1, 0]) - x0) / max(nx - 1, 1)
                dy = (float(rm_cells[-1, 0, 1]) - y0) / max(ny - 1, 1)
                dz = d[:, 2]
                t_pl = jnp.where(jnp.abs(dz) > 1e-9,
                                 (z0 - o[:, 2]) / dz, jnp.inf)
                p = o + t_pl[:, None] * d
                ix = jnp.round((p[:, 0] - x0)
                               / max(abs(dx), 1e-9)).astype(jnp.int32)
                iy = jnp.round((p[:, 1] - y0)
                               / max(abs(dy), 1e-9)).astype(jnp.int32)
                if dx < 0:
                    ix = -ix
                if dy < 0:
                    iy = -iy
                inside = ((t_pl > 0.) & (ix >= 0) & (ix < nx)
                          & (iy >= 0) & (iy < ny)
                          & (t_pl < depth + 1e-6))
                col = jnp.asarray(rm_img.astype(np.float64)
                                  .astype(o.dtype))[
                    jnp.clip(iy, 0, ny - 1), jnp.clip(ix, 0, nx - 1)]
                img = jnp.where(inside[:, None],
                                0.35 * img + 0.65 * col, img)
            return img.astype(jnp.float32)

        jitted = jax.jit(prog)
        if len(_RENDER_CACHE) > 16:
            _RENDER_CACHE.pop(next(iter(_RENDER_CACHE)))
        _RENDER_CACHE[key] = jitted

    img = jitted(jnp.asarray(orig.astype(rd)),
                 jnp.asarray(d_world.astype(rd)))
    return np.asarray(img).reshape(h, w, 3)
