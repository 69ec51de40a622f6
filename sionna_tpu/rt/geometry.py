"""Jittable geometry primitives for the RT solver: ray-triangle
intersection, bounce tracing, on-device sequence dedupe, spherical
bases, and the content-fingerprinted jit executable cache.

Design for TPU/XLA: dense batched Moller-Trumbore over
[num_rays, num_triangles] is pure VPU math with static shapes; large
scenes route through the clustered acceleration structure in
accel.py.  Complex outputs cross the TPU transfer boundary as
(re, im) float pairs (see :func:`run_jitted`).
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..phy.constants import PI
from .accel import nearest_hit_accel, any_blocking_hit_accel

EPS = 1e-5


def normalize(v, axis=-1):
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, 1e-30)


def host_real_dtype():
    """Real dtype for host->device geometry: float64 on CPU (tight
    test tolerances), float32 on TPU (f64 host transfers are
    unsupported by the backend; f32 phases are mod-2pi-reduced in
    ``phase_exp`` so accuracy holds for km-scale paths)."""
    return np.float64 if jax.default_backend() == "cpu" \
        else np.float32


def host_int_dtype():
    return np.int64 if jax.default_backend() == "cpu" else np.int32


_JIT_CACHE = {}
_JIT_CACHE_MAX = 64


def run_jitted(cache_key, fn, *args):
    """Runs ``fn(*args)`` under jit and fetches the resulting dict to
    host NumPy.  Complex outputs are split into (re, im) float pairs
    inside the program and re-joined on host — complex arrays cannot
    cross the TPU transfer boundary.  This also turns each solver
    stage into ONE fused XLA program instead of hundreds of eager
    dispatches (the TPU-native hot path).

    ``cache_key`` must fingerprint every value ``fn`` closes over
    (geometry, materials, sequences, device metadata): compiled
    executables are reused for identical keys, so repeated solves of
    the same configuration skip retracing entirely.

    All outputs are PACKED into one flat vector per dtype group
    inside the program and fetched with a single transfer per group:
    through the tunnel every ``np.asarray`` is a separate ~20-30 ms
    RPC, and a solver stage returning ~16 small fields (complex
    fields split re/im) spent ~0.28 s per stage on fetches alone —
    10x the device compute for a street-canyon solve."""
    cached = _JIT_CACHE.get(cache_key)
    if cached is None:
        spec = []  # (name, is_complex, shape, group_dtype), in order

        def packed(*a):
            out = fn(*a)
            groups = {}
            spec.clear()
            for k in sorted(out):
                v = out[k]
                if jnp.iscomplexobj(v):
                    # re and im ride consecutively in the same group
                    re = jnp.real(v)
                    im = jnp.imag(v)
                    gd = re.dtype
                    groups.setdefault(str(gd), []).append(
                        jnp.concatenate([re.reshape(-1),
                                         im.reshape(-1)]))
                    spec.append((k, True, v.shape, str(gd)))
                else:
                    if v.dtype == jnp.bool_:
                        v = v.astype(jnp.float32)
                        spec.append((k, "bool", v.shape,
                                     str(v.dtype)))
                    else:
                        spec.append((k, False, v.shape,
                                     str(v.dtype)))
                    groups.setdefault(str(v.dtype), []).append(
                        v.reshape(-1))
            return {g: jnp.concatenate(vs) if len(vs) > 1 else vs[0]
                    for g, vs in groups.items()}
        jitted = jax.jit(packed)
        cached = (jitted, spec)
        if len(_JIT_CACHE) >= _JIT_CACHE_MAX:
            _JIT_CACHE.pop(next(iter(_JIT_CACHE)))
        _JIT_CACHE[cache_key] = cached
    jitted, spec = cached
    raw = jitted(*args)
    # one fetch per dtype group
    host_groups = {g: np.asarray(v) for g, v in raw.items()}
    # The spec is populated at trace time and shared with unpack time;
    # correctness relies on cache_key fingerprinting every
    # shape-affecting input.  Fail loudly (not silently misaligned) if
    # a key omission ever pairs a stale spec with a retraced program.
    expect = {}
    for _, kind, shape, group in spec:
        size = int(np.prod(shape)) if shape else 1
        expect[group] = expect.get(group, 0) + \
            (2 * size if kind is True else size)
    actual = {g: v.size for g, v in host_groups.items()}
    if expect != actual:
        raise RuntimeError(
            "run_jitted: packed output sizes do not match the recorded "
            f"spec (expected {expect}, got {actual}) — the jit cache "
            "key is missing a shape-affecting input")
    offsets = {g: 0 for g in host_groups}
    host = {}
    for name, kind, shape, group in spec:
        size = int(np.prod(shape)) if shape else 1
        o = offsets[group]
        if kind is True:  # complex: re then im, contiguous
            re = host_groups[group][o:o + size].reshape(shape)
            im = host_groups[group][o + size:o + 2 * size].reshape(
                shape)
            host[name] = (re + 1j * im).astype(np.complex64)
            offsets[group] = o + 2 * size
        else:
            v = host_groups[group][o:o + size].reshape(shape)
            if kind == "bool":
                v = v.astype(bool)
            host[name] = v
            offsets[group] = o + size
    return host


def phase_exp(length, lam, sign=-1.):
    """exp(sign * 2j pi length / lam) as complex64.

    The angle is reduced mod 2 pi in the input (float64) precision
    before the complex exponential so long paths keep accurate phases
    while no complex128 ever materializes (unsupported on TPU)."""
    ang = jnp.mod(length / lam, 1.) * (2. * PI)
    return jnp.exp(1j * (sign * ang).astype(jnp.float32))


def moller_trumbore(orig, dirs, tri):
    """Batched ray-triangle intersection.

    orig/dirs: [R, 3]; tri: [T, 3, 3].
    Returns (t [R, T], hit [R, T] bool) with t the ray parameter.

    Component (SoA) arithmetic: every large intermediate is [R, T],
    never [R, T, 3] — a minor dim of 3 pads to 128 lanes on TPU and
    costs a measured 6.5x (5.5 vs 36 Gtests/s on v5e)."""
    # per-component broadcasts: rays [R, 1], triangles [1, T]
    dx, dy, dz = (dirs[:, i:i + 1] for i in range(3))
    ox, oy, oz = (orig[:, i:i + 1] for i in range(3))
    v0 = tri[:, 0]
    e1 = tri[:, 1] - v0
    e2 = tri[:, 2] - v0
    e1x, e1y, e1z = (e1[None, :, i] for i in range(3))
    e2x, e2y, e2z = (e2[None, :, i] for i in range(3))
    v0x, v0y, v0z = (v0[None, :, i] for i in range(3))
    # p = dirs x e2                                     [R, T]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = px * e1x + py * e1y + pz * e1z
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1. / det, 0.)
    sx = ox - v0x
    sy = oy - v0y
    sz = oz - v0z
    u = (sx * px + sy * py + sz * pz) * inv_det
    # q = s x e1
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = ((jnp.abs(det) > 1e-12) & (u >= -1e-9) & (v >= -1e-9)
           & (u + v <= 1. + 1e-9) & (t > EPS))
    return t, hit


def nearest_hit(orig, dirs, tri, max_elems=16_000_000, accel=None):
    """Nearest intersection per ray, chunking over triangles so the
    [rays, triangles] workspace stays bounded for large scenes.
    With ``accel`` (a TriangleAccel over the same ``tri``), the query
    runs through the clustered culling structure instead.

    Returns (t_min [R], tri_idx [R], has_hit [R])."""
    if accel is not None:
        return nearest_hit_accel(orig, dirs, accel)
    num_rays = orig.shape[0]
    num_tri = tri.shape[0]
    if num_rays * num_tri <= max_elems:
        t, hit = moller_trumbore(orig, dirs, tri)
        t = jnp.where(hit, t, jnp.inf)
        idx = jnp.argmin(t, axis=-1).astype(jnp.int32)
        t_min = jnp.take_along_axis(t, idx[:, None], axis=1)[:, 0]
        return t_min, idx, jnp.isfinite(t_min)

    chunk = max(64, max_elems // max(num_rays, 1))
    n_chunks = -(-num_tri // chunk)
    pad = n_chunks * chunk - num_tri
    tri_p = jnp.concatenate(
        [tri, jnp.zeros((pad, 3, 3), tri.dtype)], axis=0)
    tri_c = tri_p.reshape(n_chunks, chunk, 3, 3)
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk

    def body(carry, args):
        t_best, i_best = carry
        tri_chunk, base = args
        t, hit = moller_trumbore(orig, dirs, tri_chunk)
        t = jnp.where(hit, t, jnp.inf)
        i_loc = jnp.argmin(t, axis=-1).astype(jnp.int32)
        t_loc = jnp.take_along_axis(t, i_loc[:, None], axis=1)[:, 0]
        better = t_loc < t_best
        return (jnp.where(better, t_loc, t_best),
                jnp.where(better, base + i_loc, i_best)), None

    init = (jnp.full((num_rays,), jnp.inf, tri.dtype),
            jnp.zeros((num_rays,), jnp.int32))
    (t_min, idx), _ = jax.lax.scan(body, init, (tri_c, bases))
    return t_min, idx, jnp.isfinite(t_min)


def any_blocking_hit(orig, dirs, tri, excl_ids=None,
                     max_elems=16_000_000, accel=None):
    """Whether each segment [orig, orig+dirs] intersects any triangle
    with ray parameter in (eps, 1-eps), ignoring triangles listed in
    ``excl_ids`` [R, K]; chunked over triangles.  With ``accel``, the
    query runs through the clustered culling structure instead."""
    if accel is not None:
        return any_blocking_hit_accel(orig, dirs, accel,
                                      excl_ids=excl_ids)
    num_rays = orig.shape[0]
    num_tri = tri.shape[0]
    chunk = num_tri if num_rays * num_tri <= max_elems \
        else max(64, max_elems // max(num_rays, 1))
    n_chunks = -(-num_tri // chunk)
    pad = n_chunks * chunk - num_tri
    tri_p = jnp.concatenate(
        [tri, jnp.zeros((pad, 3, 3), tri.dtype)], axis=0)
    tri_c = tri_p.reshape(n_chunks, chunk, 3, 3)
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk

    def body(blocked, args):
        tri_chunk, base = args
        t, hit = moller_trumbore(orig, dirs, tri_chunk)
        b = hit & (t > 1e-4) & (t < 1. - 1e-4)
        if excl_ids is not None:
            gid = base + jnp.arange(tri_chunk.shape[0],
                                    dtype=jnp.int32)        # [chunk]
            excl = jnp.any(
                gid[None, None, :] == excl_ids[:, :, None], axis=1)
            b &= ~excl
        return blocked | jnp.any(b, axis=-1), None

    init = jnp.zeros((num_rays,), bool)
    blocked, _ = jax.lax.scan(body, init, (tri_c, bases))
    return blocked


def tri_normals(tri):
    """[T, 3] unit normals"""
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    return normalize(n)


def trace(tri, normals, orig, dirs, depth, accel=None):
    """Traces rays through ``depth`` specular bounces.

    Returns hit-triangle ids [R, depth] (-1 once escaped)."""
    num_rays = orig.shape[0]

    def body(carry, _):
        o, d, active = carry
        t_min, idx, found = nearest_hit(o, d, tri, accel=accel)
        has_hit = found & active
        n = normals[idx]                               # [R, 3]
        # flip normal to face the incoming ray
        n = jnp.where(jnp.sum(n * d, axis=-1, keepdims=True) > 0,
                      -n, n)
        p_hit = o + t_min[:, None] * d
        d_ref = d - 2. * jnp.sum(d * n, axis=-1, keepdims=True) * n
        o_new = jnp.where(has_hit[:, None],
                          p_hit + EPS * d_ref, o)
        d_new = jnp.where(has_hit[:, None], d_ref, d)
        ids = jnp.where(has_hit, idx, -1)
        return (o_new, d_new, has_hit), ids

    active0 = jnp.ones((num_rays,), bool)
    _, ids = jax.lax.scan(body, (orig, dirs, active0), None,
                          length=depth)
    return jnp.transpose(ids)                          # [R, depth]


TRACE_JIT = jax.jit(trace, static_argnums=(4,))


def trace_unique(tri, normals, orig, dirs, depth, cap, accel=None):
    """Traces rays and deduplicates hit-sequence prefixes ON DEVICE.

    Fuses :func:`trace` with a per-depth lexicographic sort +
    first-occurrence compaction so the host never touches the raw
    [R, depth] hit table (np.unique over 200k rows costs ~0.3 s of
    single-core host time per solve, plus the transfer).  For each
    prefix length d in 1..depth, returns the unique all-hit prefixes,
    sorted ascending (matching np.unique), left-compacted into a
    static [cap, d] buffer padded with -1, together with the unique
    count (clipped to cap).

    Returns (uniq: tuple of [cap, d] int32, counts: [depth] int32)."""
    ids = trace(tri, normals, orig, dirs, depth, accel)  # [R, depth]
    num_tri = tri.shape[0]
    uniq_all, counts = [], []
    for d in range(1, depth + 1):
        pref = ids[:, :d]                              # [R, d]
        valid = jnp.all(pref >= 0, axis=1)             # [R]
        # invalid rows -> sentinel num_tri in every column: they sort
        # last and can never collide with a valid prefix
        key_rows = jnp.where(valid[:, None], pref, num_tri)
        # lexicographic ascending sort (primary key = column 0)
        perm = jnp.lexsort(tuple(key_rows[:, c]
                                 for c in range(d - 1, -1, -1)))
        rows = key_rows[perm]                          # [R, d] sorted
        valid_s = valid[perm]
        first = jnp.concatenate(
            [jnp.ones((1,), bool),
             jnp.any(rows[1:] != rows[:-1], axis=1)])
        new = first & valid_s
        dest = jnp.cumsum(new.astype(jnp.int32)) - 1   # [R]
        n_uniq = jnp.minimum(dest[-1] + 1, cap)
        dest = jnp.where(new, dest, cap)               # drop non-first
        out = jnp.full((cap + 1, d), -1, jnp.int32)
        out = out.at[dest].set(rows.astype(jnp.int32), mode="drop")
        uniq_all.append(out[:cap])
        counts.append(n_uniq.astype(jnp.int32))
    return tuple(uniq_all), jnp.stack(counts)


TRACE_UNIQUE_JIT = jax.jit(trace_unique, static_argnums=(4, 5))


def fibonacci_sphere(n):
    """[n, 3] quasi-uniform directions on the unit sphere"""
    i = np.arange(n) + 0.5
    phi = np.pi * (1. + np.sqrt(5.)) * i
    z = 1. - 2. * i / n
    r = np.sqrt(np.maximum(1. - z ** 2, 0.))
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1)


def rot_matrix(orientation):
    """ZYX rotation matrix from [yaw, pitch, roll] (TR 38.901
    7.1-4)."""
    a, b, c = orientation
    ca, sa = np.cos(a), np.sin(a)
    cb, sb = np.cos(b), np.sin(b)
    cc, sc = np.cos(c), np.sin(c)
    return np.array([
        [ca * cb, ca * sb * sc - sa * cc, ca * sb * cc + sa * sc],
        [sa * cb, sa * sb * sc + ca * cc, sa * sb * cc - ca * sc],
        [-sb, cb * sc, cb * cc]])


def unit_to_angles(v):
    """Unit vectors [..., 3] -> (theta, phi)"""
    theta = jnp.arccos(jnp.clip(v[..., 2], -1., 1.))
    phi = jnp.arctan2(v[..., 1], v[..., 0])
    return theta, phi


def sph_basis(v):
    """Spherical unit vectors (e_theta, e_phi) transverse to
    direction v [..., 3]."""
    theta, phi = unit_to_angles(v)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    e_theta = jnp.stack([ct * cp, ct * sp, -st], axis=-1)
    e_phi = jnp.stack([-sp, cp, jnp.zeros_like(sp)], axis=-1)
    return e_theta, e_phi


def in_triangle(p, a, b, c):
    """Barycentric inside-test for points p against triangles
    (a, b, c), broadcasting over leading dims."""
    v0 = c - a
    v1 = b - a
    v2 = p - a
    d00 = jnp.sum(v0 * v0, -1)
    d01 = jnp.sum(v0 * v1, -1)
    d11 = jnp.sum(v1 * v1, -1)
    d20 = jnp.sum(v2 * v0, -1)
    d21 = jnp.sum(v2 * v1, -1)
    denom = d00 * d11 - d01 * d01
    denom = jnp.where(jnp.abs(denom) > 1e-18, denom, 1e-18)
    u = (d11 * d20 - d01 * d21) / denom
    v = (d00 * d21 - d01 * d20) / denom
    return (u >= -1e-6) & (v >= -1e-6) & (u + v <= 1. + 1e-6)
