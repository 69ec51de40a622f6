"""Path solver: shoot-and-bounce candidate discovery plus exact
image-method refinement (API parity with sionna.rt.PathSolver /
Paths, see SURVEY.md 2.12; fresh TPU-first implementation).

Design for TPU/XLA:
- Ray-triangle intersection is dense batched Moller-Trumbore over
  [num_rays, num_triangles] — pure VPU math with static shapes, no
  pointer-chasing BVH needed for the scene sizes handled on-device;
  the candidate-sequence dedupe runs host-side between two jitted
  stages.
- The image method evaluates all (sequence, rx) combinations as one
  batched computation: mirror cascades, plane intersections, occlusion
  checks, and polarized Fresnel field transfer are all elementwise /
  small-matmul ops that XLA fuses.
"""

import hashlib

import numpy as np

import jax
import jax.numpy as jnp

from ..phy.constants import PI, SPEED_OF_LIGHT
from .accel import (build_accel, nearest_hit_accel,
                    any_blocking_hit_accel)
from .diffraction import extract_wedges, utd_coefficients

__all__ = ["PathSolver", "Paths"]

_EPS = 1e-5

# Scenes with at least this many triangles get the clustered
# acceleration structure (native C++ build + dense cluster culling,
# see accel.py); smaller scenes stay on the plain dense sweep whose
# fixed overhead is lower.
ACCEL_MIN_TRIS = 2048


# ----------------------------------------------------------------------
# Geometry primitives (jittable)
# ----------------------------------------------------------------------
def _normalize(v, axis=-1):
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, 1e-30)


def _host_real_dtype():
    """Real dtype for host->device geometry: float64 on CPU (tight
    test tolerances), float32 on TPU (f64 host transfers are
    unsupported by the backend; f32 phases are mod-2pi-reduced in
    ``_phase_exp`` so accuracy holds for km-scale paths)."""
    return np.float64 if jax.default_backend() == "cpu" \
        else np.float32


def _host_int_dtype():
    return np.int64 if jax.default_backend() == "cpu" else np.int32


_JIT_CACHE = {}
_JIT_CACHE_MAX = 64


def _run_jitted(cache_key, fn, *args):
    """Runs ``fn(*args)`` under jit and fetches the resulting dict to
    host NumPy.  Complex outputs are split into (re, im) float pairs
    inside the program and re-joined on host — complex arrays cannot
    cross the TPU transfer boundary.  This also turns each solver
    stage into ONE fused XLA program instead of hundreds of eager
    dispatches (the TPU-native hot path).

    ``cache_key`` must fingerprint every value ``fn`` closes over
    (geometry, materials, sequences, device metadata): compiled
    executables are reused for identical keys, so repeated solves of
    the same configuration skip retracing entirely."""
    jitted = _JIT_CACHE.get(cache_key)
    if jitted is None:
        def split(*a):
            out = fn(*a)
            flat = {}
            for k, v in out.items():
                if jnp.iscomplexobj(v):
                    flat[k] = (jnp.real(v), jnp.imag(v))
                else:
                    flat[k] = v
            return flat
        jitted = jax.jit(split)
        if len(_JIT_CACHE) >= _JIT_CACHE_MAX:
            _JIT_CACHE.pop(next(iter(_JIT_CACHE)))
        _JIT_CACHE[cache_key] = jitted
    raw = jitted(*args)
    host = {}
    for k, v in raw.items():
        if isinstance(v, tuple):
            host[k] = (np.asarray(v[0])
                       + 1j * np.asarray(v[1])).astype(np.complex64)
        else:
            host[k] = np.asarray(v)
    return host


def _phase_exp(length, lam, sign=-1.):
    """exp(sign * 2j pi length / lam) as complex64.

    The angle is reduced mod 2 pi in the input (float64) precision
    before the complex exponential so long paths keep accurate phases
    while no complex128 ever materializes (unsupported on TPU)."""
    ang = jnp.mod(length / lam, 1.) * (2. * PI)
    return jnp.exp(1j * (sign * ang).astype(jnp.float32))


def moller_trumbore(orig, dirs, tri):
    """Batched ray-triangle intersection.

    orig/dirs: [R, 3]; tri: [T, 3, 3].
    Returns (t [R, T], hit [R, T] bool) with t the ray parameter."""
    v0 = tri[:, 0]
    e1 = tri[:, 1] - v0
    e2 = tri[:, 2] - v0
    # [R, T, 3]
    p = jnp.cross(dirs[:, None, :], e2[None])
    det = jnp.sum(p * e1[None], axis=-1)               # [R, T]
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1. / det, 0.)
    s = orig[:, None, :] - v0[None]                    # [R, T, 3]
    u = jnp.sum(s * p, axis=-1) * inv_det
    q = jnp.cross(s, e1[None])
    v = jnp.sum(dirs[:, None, :] * q, axis=-1) * inv_det
    t = jnp.sum(e2[None] * q, axis=-1) * inv_det
    hit = ((jnp.abs(det) > 1e-12) & (u >= -1e-9) & (v >= -1e-9)
           & (u + v <= 1. + 1e-9) & (t > _EPS))
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


def _slab_transmission(cos_i, eta, d_th, lam):
    """ITU-R P.2040 single-layer slab transmission coefficients.

    cos_i: |cos| of the incidence angle (broadcastable), eta: complex
    relative permittivity, d_th: slab thickness [m], lam: wavelength
    [m].  Returns (t_te, t_tm) complex field transmission through the
    slab including internal multiple reflections:

        T = (1 - r^2) e^{-jq} / (1 - r^2 e^{-2jq}),
        q = 2 pi d/lam * sqrt(eta - sin^2 theta_1)

    with r the TE/TM single-interface Fresnel coefficient, times the
    insertion correction e^{+j 2 pi d cos(theta_1) / lam}: the
    geometric path already counts the slab crossing as free space, so
    the returned factor is the slab's INSERTION transfer function
    (vacuum -> exactly 1).  Exact for a homogeneous slab; at normal
    incidence TE and TM agree."""
    cos_i = jnp.clip(cos_i, 0., 1.)
    sin2 = 1. - cos_i ** 2
    root = jnp.sqrt(eta - sin2)
    r_te = (cos_i - root) / (cos_i + root)
    r_tm = (eta * cos_i - root) / (eta * cos_i + root)
    q = (2. * PI * d_th / lam) * root
    corr = jnp.exp(1j * (2. * PI * d_th / lam)
                   * cos_i.astype(jnp.complex64))

    def slab(r):
        e1 = jnp.exp(-1j * q.astype(jnp.complex64))
        return ((1. - r ** 2) * e1
                / (1. - (r ** 2) * e1 * e1 + 1e-30)) * corr

    return (slab(r_te.astype(jnp.complex64)),
            slab(r_tm.astype(jnp.complex64)))


def transmission_product(orig, dirs, tri, eta_tri, th_tri, lam,
                         excl_ids=None, max_elems=16_000_000,
                         accel=None):
    """Complex transmission factor of segment [orig, orig+dirs]
    through every blocking triangle (product of per-blocker slab
    coefficients, polarization-averaged), ignoring ``excl_ids``.

    Polarization note: each blocker contributes the unpolarized
    average (t_TE + t_TM)/2 in its own incidence plane, so the product
    is a scalar and commutes — exact at normal incidence (t_TE = t_TM)
    and within tenths of a dB of the full polarimetric cascade away
    from grazing for building materials.  With ``accel``, the query
    runs through the clustered structure (see accel.py)."""
    if accel is not None:
        from .accel import transmission_product_accel
        return transmission_product_accel(
            orig, dirs, accel, eta_tri, th_tri, lam,
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
    eta_p = jnp.concatenate(
        [jnp.asarray(eta_tri, jnp.complex64),
         jnp.ones((pad,), jnp.complex64)])
    eta_c = eta_p.reshape(n_chunks, chunk)
    th_p = jnp.concatenate(
        [jnp.asarray(th_tri, jnp.float32), jnp.zeros((pad,),
                                                     jnp.float32)])
    th_c = th_p.reshape(n_chunks, chunk)
    n_p = jnp.concatenate(
        [_tri_normals(tri), jnp.ones((pad, 3), tri.dtype)])
    n_c = n_p.reshape(n_chunks, chunk, 3)
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    d_hat = dirs / jnp.maximum(
        jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-30)

    def body(prod, args):
        tri_chunk, eta_k, th_k, n_k, base = args
        t, hit = moller_trumbore(orig, dirs, tri_chunk)
        b = hit & (t > 1e-4) & (t < 1. - 1e-4)
        if excl_ids is not None:
            gid = base + jnp.arange(tri_chunk.shape[0],
                                    dtype=jnp.int32)
            b &= ~jnp.any(
                gid[None, None, :] == excl_ids[:, :, None], axis=1)
        cos_i = jnp.abs(jnp.sum(d_hat[:, None, :] * n_k[None],
                                axis=-1))
        t_te, t_tm = _slab_transmission(
            cos_i.astype(jnp.float32), eta_k[None], th_k[None], lam)
        t_eff = 0.5 * (t_te + t_tm)
        # typed complex64 one: a bare `1.+0j` literal becomes a c128
        # constant under x64, and the TPU compiler cannot lower the
        # resulting c128->f32/c64 converts (Mosaic CHECK failure)
        one_c = jnp.asarray(1. + 0j, jnp.complex64)
        t_eff = jnp.where(b, t_eff, one_c)
        return prod * jnp.prod(t_eff, axis=-1), None

    init = jnp.ones((num_rays,), jnp.complex64)
    prod, _ = jax.lax.scan(
        body, init, (tri_c, eta_c, th_c, n_c, bases))
    return prod


def _tri_normals(tri):
    """[T, 3] unit normals"""
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    return _normalize(n)


def _trace(tri, normals, orig, dirs, depth, accel=None):
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
                          p_hit + _EPS * d_ref, o)
        d_new = jnp.where(has_hit[:, None], d_ref, d)
        ids = jnp.where(has_hit, idx, -1)
        return (o_new, d_new, has_hit), ids

    active0 = jnp.ones((num_rays,), bool)
    _, ids = jax.lax.scan(body, (orig, dirs, active0), None,
                          length=depth)
    return jnp.transpose(ids)                          # [R, depth]


_TRACE_JIT = jax.jit(_trace, static_argnums=(4,))


def _trace_unique(tri, normals, orig, dirs, depth, cap, accel=None):
    """Traces rays and deduplicates hit-sequence prefixes ON DEVICE.

    Fuses :func:`_trace` with a per-depth lexicographic sort +
    first-occurrence compaction so the host never touches the raw
    [R, depth] hit table (np.unique over 200k rows costs ~0.3 s of
    single-core host time per solve, plus the transfer).  For each
    prefix length d in 1..depth, returns the unique all-hit prefixes,
    sorted ascending (matching np.unique), left-compacted into a
    static [cap, d] buffer padded with -1, together with the unique
    count (clipped to cap).

    Returns (uniq: tuple of [cap, d] int32, counts: [depth] int32)."""
    ids = _trace(tri, normals, orig, dirs, depth, accel)  # [R, depth]
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


_TRACE_UNIQUE_JIT = jax.jit(_trace_unique, static_argnums=(4, 5))


def _fibonacci_sphere(n):
    """[n, 3] quasi-uniform directions on the unit sphere"""
    i = np.arange(n) + 0.5
    phi = np.pi * (1. + np.sqrt(5.)) * i
    z = 1. - 2. * i / n
    r = np.sqrt(np.maximum(1. - z ** 2, 0.))
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1)


def _rot_matrix(orientation):
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


def _unit_to_angles(v):
    """Unit vectors [..., 3] -> (theta, phi)"""
    theta = jnp.arccos(jnp.clip(v[..., 2], -1., 1.))
    phi = jnp.arctan2(v[..., 1], v[..., 0])
    return theta, phi


def _sph_basis(v):
    """Spherical unit vectors (e_theta, e_phi) transverse to
    direction v [..., 3]."""
    theta, phi = _unit_to_angles(v)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    e_theta = jnp.stack([ct * cp, ct * sp, -st], axis=-1)
    e_phi = jnp.stack([-sp, cp, jnp.zeros_like(sp)], axis=-1)
    return e_theta, e_phi


# ----------------------------------------------------------------------
# Paths container
# ----------------------------------------------------------------------
class Paths:
    """Propagation paths (API parity with sionna.rt.Paths).

    a : [num_rx, num_rx_ant, num_tx, num_tx_ant, num_paths] complex
        path coefficients (without Doppler)
    tau : [num_rx, num_tx, num_paths] delays [s]

    Fields are host NumPy arrays: the solver's device stages return
    complex results as (re, im) float pairs because complex arrays
    cannot cross the TPU transfer boundary; CIR assembly is cheap
    host math."""

    def __init__(self, a, tau, valid, theta_t, phi_t, theta_r, phi_r,
                 doppler, interactions, types=None):
        self.a = a
        self.tau = tau
        self.valid = valid
        self.theta_t = theta_t
        self.phi_t = phi_t
        self.theta_r = theta_r
        self.phi_r = phi_r
        self.doppler = doppler
        self.interactions = interactions
        # [num_paths] interaction type per path: 0 LoS, 1 specular,
        # 2 diffracted, 3 scattered (upstream InteractionType codes)
        self.types = (types if types is not None
                      else np.zeros(self.a.shape[-1], np.int32))

    @property
    def num_paths(self):
        return self.a.shape[-1]

    def cir(self, sampling_frequency=None, num_time_steps=1,
            normalize_delays=False, out_type="jax"):
        """Channel impulse response with Doppler evolution.

        Returns (a [num_rx, num_rx_ant, num_tx, num_tx_ant,
        num_paths, num_time_steps], tau [num_rx, num_tx,
        num_paths])."""
        if sampling_frequency is None:
            sampling_frequency = 1.
        t = np.arange(num_time_steps) / sampling_frequency
        doppler = np.asarray(self.doppler)
        phase = np.exp(2j * PI * doppler[..., None] * t)  # [rx,tx,P,T]
        a = (np.asarray(self.a)[..., None]
             * phase[:, None, :, None, :, :]).astype(np.complex64)
        tau = np.asarray(self.tau)
        valid = np.asarray(self.valid)
        if normalize_delays:
            tau_min = np.min(
                np.where(valid, tau, np.inf), axis=-1, keepdims=True)
            tau_min = np.where(np.isfinite(tau_min), tau_min, 0.)
            tau = np.where(valid, tau - tau_min, tau)
        if out_type == "numpy":
            return a, tau
        return jnp.asarray(a), jnp.asarray(
            tau.astype(_host_real_dtype()))

    def cfr(self, frequencies, sampling_frequency=None,
            num_time_steps=1, normalize_delays=False,
            normalize=False, out_type="jax"):
        """Channel frequency response at baseband ``frequencies``
        (upstream Paths.cfr; used e.g. in the reference's
        SYS_Meets_RT tutorial):

        h[..., t, f] = sum_p a_p(t) exp(-2j pi f tau_p)

        Returns [num_rx, num_rx_ant, num_tx, num_tx_ant,
        num_time_steps, num_freqs]."""
        from ..phy.channel.utils import cir_to_ofdm_channel
        a, tau = self.cir(sampling_frequency=sampling_frequency,
                          num_time_steps=num_time_steps,
                          normalize_delays=normalize_delays,
                          out_type="numpy")
        # cir_to_ofdm_channel expects batched [b, rx, rxa, tx, txa,
        # P, T] with tau [b, rx, tx, P]
        h = cir_to_ofdm_channel(np.asarray(frequencies), a[None],
                                tau[None], normalize=normalize)
        # [1, rx, rxa, tx, txa, T, F] -> drop batch
        h = np.asarray(h)[0]
        if out_type == "numpy":
            return h
        return jnp.asarray(h)

    def taps(self, bandwidth, l_min, l_max, sampling_frequency=None,
             num_time_steps=1, normalize=False,
             normalize_delays=True, out_type="jax"):
        """Bandlimited discrete-time channel taps (upstream
        Paths.taps): sinc-reconstructed taps at lags l_min..l_max for
        a system of ``bandwidth`` Hz.

        Returns [num_rx, num_rx_ant, num_tx, num_tx_ant,
        num_time_steps, l_max - l_min + 1]."""
        from ..phy.channel.utils import cir_to_time_channel
        a, tau = self.cir(sampling_frequency=sampling_frequency,
                          num_time_steps=num_time_steps,
                          normalize_delays=normalize_delays,
                          out_type="numpy")
        hm = cir_to_time_channel(bandwidth, a[None], tau[None],
                                 l_min, l_max, normalize=normalize)
        hm = np.asarray(hm)[0]
        if out_type == "numpy":
            return hm
        return jnp.asarray(hm)


# ----------------------------------------------------------------------
# Path solver
# ----------------------------------------------------------------------
class PathSolver:
    """Computes propagation paths between all scene transmitters and
    receivers: LoS, up to ``max_depth`` specular reflections,
    transmission through blocking surfaces (``refraction=True``,
    default, matching the upstream PathSolver — blocked LoS/specular
    segments are attenuated by the ITU-R P.2040 slab coefficient of
    each blocker instead of discarded), and optionally first-order
    UTD wedge diffraction (``diffraction=True``) and single-bounce
    diffuse scattering (``diffuse_reflection=True``, requires
    materials with a nonzero ``scattering_coefficient``).  With
    refraction enabled, diffracted and scattered path segments are
    attenuated through blockers the same way.

    Call: solver(scene, max_depth=3, max_num_paths_per_src=100000,
    samples_per_src=20000, los=True, specular_reflection=True,
    refraction=True, diffraction=False, diffuse_reflection=False,
    diffuse_samples=4096, max_num_wedges=20000, seed=41) -> Paths.
    """

    def __call__(self, scene, max_depth=3,
                 max_num_paths_per_src=100000,
                 samples_per_src=20000, los=True,
                 specular_reflection=True,
                 refraction=True,
                 diffraction=False,
                 diffuse_reflection=False,
                 diffuse_samples=4096,
                 max_num_wedges=20000,
                 seed=41):
        tx_names = list(scene.transmitters)
        rx_names = list(scene.receivers)
        if not tx_names or not rx_names:
            raise ValueError(
                "The scene must contain at least one transmitter and "
                "one receiver")
        txs = [scene.transmitters[n] for n in tx_names]
        rxs = [scene.receivers[n] for n in rx_names]
        if scene.tx_array is None or scene.rx_array is None:
            raise ValueError(
                "scene.tx_array and scene.rx_array must be set")

        rd = _host_real_dtype()
        idt = _host_int_dtype()
        tri = jnp.asarray(scene.triangles.astype(rd))
        has_geometry = scene.num_triangles > 0
        normals = _tri_normals(tri) if has_geometry else None
        # Clustered acceleration structure for large scenes (cached
        # per geometry fingerprint; native C++ builder, see accel.py).
        self._accel = (build_accel(scene.triangles.astype(rd))
                       if scene.num_triangles >= ACCEL_MIN_TRIS
                       else None)

        tx_pos = np.stack([t.position for t in txs]).astype(rd)
        rx_pos = np.stack([r.position for r in rxs]).astype(rd)

        # ------------------------------------------------------------
        # 1) Candidate reflection sequences via shoot-and-bounce
        # ------------------------------------------------------------
        sequences = [np.zeros((1, 0), idt)] if los else []
        if specular_reflection and has_geometry and max_depth > 0:
            dirs = jnp.asarray(
                _fibonacci_sphere(samples_per_src).astype(rd))
            # All tx sources traced as one ray batch; the prefix
            # dedupe (lexsort + first-occurrence compaction) runs
            # inside the same jitted program, so one dispatch and one
            # [cap, d]-sized fetch replace the raw [R, depth] hit
            # table + host np.unique of round 1.
            num_t = tx_pos.shape[0]
            orig = jnp.broadcast_to(
                jnp.asarray(tx_pos)[:, None, :],
                (num_t,) + dirs.shape).reshape(-1, 3)
            dirs_all = jnp.broadcast_to(
                dirs[None], (num_t,) + dirs.shape).reshape(-1, 3)
            cap = int(min(max_num_paths_per_src,
                          num_t * samples_per_src))
            uniq_dev, counts_dev = _TRACE_UNIQUE_JIT(
                tri, normals, orig, dirs_all, max_depth, cap,
                self._accel)
            counts = np.asarray(counts_dev)
            # shortest depths first, capped at max_num_paths_per_src
            budget = max_num_paths_per_src
            for d in range(1, max_depth + 1):
                if budget <= 0:
                    break
                n = int(min(counts[d - 1], budget))
                if n == 0:
                    continue
                uniq = np.asarray(uniq_dev[d - 1])[:n]
                budget -= n
                sequences.append(np.ascontiguousarray(uniq, idt))

        # ------------------------------------------------------------
        # 2) Image-method evaluation of every candidate
        # ------------------------------------------------------------
        lam = scene.wavelength
        freq = scene.frequency
        eta_tri = np.array(
            [m.complex_relative_permittivity(freq)
             for m in scene.triangle_materials]
            if has_geometry else [1. + 0j], np.complex64)
        scat_tri = np.array(
            [m.scattering_coefficient
             for m in scene.triangle_materials]
            if has_geometry else [0.], rd)
        th_tri = np.array(
            [m.thickness for m in scene.triangle_materials]
            if has_geometry else [0.], np.float32)
        tx_j = jnp.asarray(tx_pos)
        rx_j = jnp.asarray(rx_pos)
        # eta/scat stay host NumPy, captured as trace-time constants:
        # complex arrays cannot be device_put through the TPU
        # transfer layer (only baked into compiled programs)
        eta_j = eta_tri
        scat_j = jnp.asarray(scat_tri)
        th_j = jnp.asarray(th_tri)

        # Fingerprint everything the jitted stages close over, so
        # repeated solves of an unchanged configuration reuse the
        # compiled executables (see _run_jitted).
        fp = hashlib.blake2b(digest_size=16)
        fp.update(scene.triangles.tobytes())
        fp.update(eta_tri.tobytes())
        fp.update(scat_tri.tobytes())
        fp.update(th_tri.tobytes())
        if has_geometry:
            for m in scene.triangle_materials:
                pat = getattr(m, "scattering_pattern", None)
                if pat is not None:
                    fp.update(repr(pat.canonical()).encode())
        fp.update(b"refr1" if refraction else b"refr0")
        for dev in txs + rxs:
            fp.update(dev.orientation.tobytes())
            fp.update(dev.velocity.tobytes())
        for arr in (scene.tx_array, scene.rx_array):
            fp.update(repr((arr.num_rows, arr.num_cols,
                            arr.vertical_spacing,
                            arr.horizontal_spacing, arr.pattern,
                            arr.polarization)).encode())
        fp.update(repr((scene.frequency, tx_pos.shape,
                        rx_pos.shape,
                        self._accel is not None)).encode())
        base_key = fp.hexdigest()

        results = []
        for seq in sequences:
            # seq stays host NumPy: it is an index constant embedded
            # at trace time (zero-size LoS arrays cannot be
            # transferred to the TPU at all)
            skey = (base_key, "spec",
                    hashlib.blake2b(seq.tobytes(),
                                    digest_size=8).hexdigest())
            out = _run_jitted(
                skey,
                lambda tp, rp, seq=seq:
                self._eval_sequences(scene, tri, normals, seq, tp,
                                     rp, eta_j, scat_j, txs, rxs,
                                     th_tri=th_j,
                                     refraction=refraction),
                tx_j, rx_j)
            out["interactions"] = np.asarray(seq)
            results.append(out)

        # ------------------------------------------------------------
        # 2b) First-order UTD wedge diffraction
        # ------------------------------------------------------------
        if diffraction and has_geometry:
            wedges = extract_wedges(np.asarray(scene.triangles))
            num_w = wedges["origin"].shape[0]
            if num_w > max_num_wedges:
                # keep the wedges nearest the device centroid
                mid = (tx_pos.mean(axis=0) + rx_pos.mean(axis=0)) / 2.
                mids = wedges["origin"] + 0.5 * wedges["length"][
                    :, None] * wedges["e_hat"]
                keep = np.argsort(
                    np.linalg.norm(mids - mid, axis=1))[
                        :max_num_wedges]
                wedges = {k: v[keep] for k, v in wedges.items()}
                num_w = max_num_wedges
            if num_w > 0:
                wedges = {k: (v.astype(rd) if v.dtype.kind == "f"
                              else v.astype(np.int32))
                          for k, v in wedges.items()}
                out = _run_jitted(
                    (base_key, "diffr", num_w),
                    lambda tp, rp:
                    self._eval_diffraction(scene, tri, wedges, tp,
                                           rp, eta_j, txs, rxs,
                                           th_tri=th_j,
                                           refraction=refraction),
                    tx_j, rx_j)
                out["interactions"] = \
                    wedges["tri_0"][:, None].astype(np.int64)
                out["kind"] = 1
                results.append(out)

        # ------------------------------------------------------------
        # 2c) Diffuse (rough-surface) scattering, single bounce
        # ------------------------------------------------------------
        if diffuse_reflection and has_geometry \
                and np.any(scat_tri > 0.):
            sample = self._sample_scatter_points(scene, scat_tri,
                                                 diffuse_samples,
                                                 seed, rd)
            if sample is not None:
                p_np, tri_idx, d_area = sample
                out = _run_jitted(
                    (base_key, "scat", diffuse_samples, seed),
                    lambda tp, rp:
                    self._eval_scattering(
                        scene, tri, normals, tp, rp, eta_j,
                        jnp.asarray(p_np), tri_idx, d_area,
                        diffuse_samples, seed, txs, rxs,
                        th_tri=th_j, refraction=refraction),
                    tx_j, rx_j)
                out["interactions"] = \
                    tri_idx[:, None].astype(np.int64)
                out["kind"] = 2
                results.append(out)

        # Concatenate over path dim (host: results are NumPy)
        def cat(field):
            return np.concatenate([r[field] for r in results],
                                  axis=-1)

        a = np.concatenate([r["a"] for r in results], axis=-1)
        # Pad interaction records to a common depth with -1
        inter = [np.asarray(r["interactions"]) for r in results]
        width = max(max((i.shape[1] for i in inter), default=1), 1)
        inter = [np.pad(i, ((0, 0), (0, width - i.shape[1])),
                        constant_values=-1) for i in inter]
        # dedupe namespace: interaction kind (0 specular, 1 diffracted,
        # 2 scattered) * 1000 + bounce depth
        depths = np.concatenate(
            [np.full(r["interactions"].shape[0],
                     1000 * r.get("kind", 0)
                     + r["interactions"].shape[1])
             for r in results])
        # per-path interaction type (upstream InteractionType codes:
        # 0 none/LoS, 1 specular, 2 diffracted, 3 scattered)
        def _type_code(r):
            kind = r.get("kind", 0)
            if kind == 1:
                return 2          # diffracted
            if kind == 2:
                return 3          # scattered
            return 1 if r["interactions"].shape[1] > 0 else 0

        types = np.concatenate(
            [np.full(r["interactions"].shape[0], _type_code(r),
                     np.int32) for r in results])
        paths = Paths(
            a=a,
            tau=cat("tau"), valid=cat("valid"),
            theta_t=cat("theta_t"), phi_t=cat("phi_t"),
            theta_r=cat("theta_r"), phi_r=cat("phi_r"),
            doppler=cat("doppler"),
            interactions=np.concatenate(inter, axis=0),
            types=types)
        self._deduplicate(paths, depths)
        return paths

    def trace_functional(self, scene, max_depth=3,
                         samples_per_src=20000,
                         max_num_paths_per_src=100000, los=True,
                         refraction=False, seed=41):
        """Differentiable functional view of the LoS+specular solver
        (upstream parity: Sionna RT is a differentiable ray tracer;
        SURVEY.md 2.12).

        Candidate path discovery (shoot-and-bounce + prefix dedupe)
        runs once against the CURRENT scene geometry; the returned
        pure function re-evaluates the image-method refinement,
        occlusion, polarized Fresnel cascade and array responses for
        given device positions and per-triangle materials:

        ``fn(tx_pos [num_tx, 3], rx_pos [num_rx, 3],
        eta [num_tri] complex, scat [num_tri]) ->
        (a [rx, rx_ant, tx, tx_ant, P] complex,
        tau [rx, tx, P], valid [rx, tx, P])``

        ``fn`` is jittable and differentiable w.r.t. every argument
        (transmitter/receiver placement, complex relative
        permittivity, scattering coefficient), enabling
        gradient-based scene optimization (coverage shaping, material
        calibration) under ``jax.grad`` on the TPU.  Geometry
        (triangles) and the discovered candidate set are baked:
        gradients hold for perturbations that do not change path
        topology (occlusion/validity masks are booleans with zero
        gradient, as in the upstream solver).  On TPU remember the
        tunnel cannot transfer complex arrays — build ``eta`` inside
        jit (e.g. ``eta_re + 1j * eta_im``).

        Returns ``(fn, (tx_pos, rx_pos, eta, scat))`` with the
        arguments at their current scene values.
        """
        tx_names = list(scene.transmitters)
        rx_names = list(scene.receivers)
        if not tx_names or not rx_names:
            raise ValueError(
                "The scene must contain at least one transmitter and "
                "one receiver")
        txs = [scene.transmitters[n] for n in tx_names]
        rxs = [scene.receivers[n] for n in rx_names]
        if scene.tx_array is None or scene.rx_array is None:
            raise ValueError(
                "scene.tx_array and scene.rx_array must be set")

        rd = _host_real_dtype()
        idt = _host_int_dtype()
        tri = jnp.asarray(scene.triangles.astype(rd))
        has_geometry = scene.num_triangles > 0
        normals = _tri_normals(tri) if has_geometry else None
        self._accel = (build_accel(scene.triangles.astype(rd))
                       if scene.num_triangles >= ACCEL_MIN_TRIS
                       else None)
        tx_pos = np.stack([t.position for t in txs]).astype(rd)
        rx_pos = np.stack([r.position for r in rxs]).astype(rd)

        sequences = [np.zeros((1, 0), idt)] if los else []
        if has_geometry and max_depth > 0:
            dirs = jnp.asarray(
                _fibonacci_sphere(samples_per_src).astype(rd))
            rows = []
            for t in range(tx_pos.shape[0]):
                orig = jnp.broadcast_to(jnp.asarray(tx_pos[t]),
                                        dirs.shape)
                rows.append(np.asarray(_TRACE_JIT(
                    tri, normals, orig, dirs, max_depth,
                    self._accel)))
            ids = np.concatenate(rows, axis=0)
            budget = max_num_paths_per_src
            for d in range(1, max_depth + 1):
                if budget <= 0:
                    break
                pref = ids[:, :d]
                pref = pref[np.all(pref >= 0, axis=1)]
                if pref.shape[0] == 0:
                    continue
                uniq = np.unique(pref, axis=0)[:budget]
                budget -= uniq.shape[0]
                sequences.append(np.ascontiguousarray(uniq, idt))

        freq = scene.frequency
        eta0 = np.array(
            [m.complex_relative_permittivity(freq)
             for m in scene.triangle_materials]
            if has_geometry else [1. + 0j], np.complex64)
        scat0 = np.array(
            [m.scattering_coefficient
             for m in scene.triangle_materials]
            if has_geometry else [0.], rd)
        th0 = np.array(
            [m.thickness for m in scene.triangle_materials]
            if has_geometry else [0.], np.float32)

        def fn(tx_pos, rx_pos, eta, scat, thickness=None):
            # With refraction=True the slab transmission is part of
            # the computation, so gradients also flow through eta and
            # thickness of BLOCKING triangles (material calibration
            # from through-wall measurements).
            th = jnp.asarray(th0) if thickness is None \
                else jnp.asarray(thickness)
            outs = [self._eval_sequences(
                scene, tri, normals, seq, jnp.asarray(tx_pos),
                jnp.asarray(rx_pos), eta, scat, txs, rxs,
                th_tri=th, refraction=refraction)
                for seq in sequences]
            a = jnp.concatenate([o["a"] for o in outs], axis=-1)
            tau = jnp.concatenate([o["tau"] for o in outs], axis=-1)
            valid = jnp.concatenate([o["valid"] for o in outs],
                                    axis=-1)
            return a, tau, valid

        return fn, (jnp.asarray(tx_pos), jnp.asarray(rx_pos),
                    jnp.asarray(eta0), jnp.asarray(scat0))

    @staticmethod
    def _deduplicate(paths, depths):
        """Invalidates duplicate paths per (rx, tx) link.

        A specular point on an edge shared by two coplanar triangles
        yields the same physical path once per triangle; keep one."""
        valid = np.array(paths.valid)
        num_rx, num_tx, num_p = valid.shape
        shape = valid.shape
        keys = np.stack([
            np.broadcast_to(np.arange(num_rx)[:, None, None], shape),
            np.broadcast_to(np.arange(num_tx)[None, :, None], shape),
            np.broadcast_to(np.asarray(depths, np.int64)[None, None],
                            shape),
            np.round(np.asarray(paths.tau) * 1e12).astype(np.int64),
            np.round(np.asarray(paths.theta_t) * 1e6).astype(np.int64),
            np.round(np.asarray(paths.phi_t) * 1e6).astype(np.int64),
        ], axis=-1).reshape(-1, 6)
        flat = valid.reshape(-1)
        cand = np.flatnonzero(flat)
        if cand.size:
            _, first = np.unique(keys[cand], axis=0,
                                 return_index=True)
            keep = np.zeros(flat.shape, bool)
            keep[cand[first]] = True
            flat &= keep
        mask = flat.reshape(shape)
        paths.valid = mask
        paths.a = paths.a * mask.astype(paths.a.dtype)[
            :, None, :, None, :]
        paths.tau = np.where(mask, paths.tau, -1.)

    # ------------------------------------------------------------------
    def _eval_sequences(self, scene, tri, normals, seq, tx_pos,
                        rx_pos, eta_tri, scat_tri, txs, rxs,
                        th_tri=None, refraction=False):
        """Evaluates all [S] reflection sequences of equal depth D for
        all TX/RX pairs.  Returns per-path fields with S paths.

        With ``refraction=True`` blocked segments are not discarded:
        each blocking triangle multiplies the path amplitude by its
        ITU-R P.2040 slab transmission coefficient (see
        :func:`transmission_product`), matching the upstream
        PathSolver's ``refraction`` interaction."""
        lam = scene.wavelength
        num_tx = tx_pos.shape[0]
        num_rx = rx_pos.shape[0]
        s_count, depth = seq.shape

        tx_arr = scene.tx_array
        rx_arr = scene.rx_array
        nta = tx_arr.num_ant
        nra = rx_arr.num_ant

        # --- Mirror cascade: images of each TX across the sequence
        # planes.  q[k]: [S, num_tx, 3]
        if depth > 0:
            v0 = tri[seq, 0]                           # [S, D, 3]
            n_pl = normals[seq]                        # [S, D, 3]
        images = [jnp.broadcast_to(tx_pos[None], (s_count, num_tx, 3))]
        for k in range(depth):
            q = images[-1]
            d = jnp.sum((q - v0[:, None, k]) * n_pl[:, None, k],
                        axis=-1, keepdims=True)
            images.append(q - 2. * d * n_pl[:, None, k])

        # --- Backward construction of reflection points
        # x[k]: [S, num_tx, num_rx, 3]; x[depth+1] = rx
        x_next = jnp.broadcast_to(rx_pos[None, None],
                                  (s_count, num_tx, num_rx, 3))
        points = [x_next]
        valid = jnp.ones((s_count, num_tx, num_rx), bool)
        for k in range(depth, 0, -1):
            q_k = images[k][:, :, None]                # [S,tx,1,3]
            v0_k = v0[:, None, None, k - 1]
            n_k = n_pl[:, None, None, k - 1]
            seg = x_next - q_k
            denom = jnp.sum(seg * n_k, axis=-1)
            num = jnp.sum((v0_k - q_k) * n_k, axis=-1)
            t_par = jnp.where(jnp.abs(denom) > 1e-12,
                              num / denom, -1.)
            valid &= (t_par > 1e-9) & (t_par < 1. + 1e-9)
            x_k = q_k + t_par[..., None] * seg
            # x_k must lie inside triangle k-1 (barycentric test)
            a_v = tri[seq[:, k - 1], 0][:, None, None]
            b_v = tri[seq[:, k - 1], 1][:, None, None]
            c_v = tri[seq[:, k - 1], 2][:, None, None]
            valid &= self._in_triangle(x_k, a_v, b_v, c_v)
            points.append(x_k)
            x_next = x_k
        points.append(jnp.broadcast_to(
            tx_pos[None, :, None], (s_count, num_tx, num_rx, 3)))
        # points list is [rx, x_D, ..., x_1, tx] -> reverse
        pts = jnp.stack(points[::-1], axis=0)  # [D+2, S, tx, rx, 3]

        # --- Segment directions and lengths
        segs = pts[1:] - pts[:-1]              # [D+1, S, tx, rx, 3]
        seg_len = jnp.linalg.norm(segs, axis=-1)
        d_hat = segs / jnp.maximum(seg_len[..., None], 1e-30)
        total_len = jnp.sum(seg_len, axis=0)   # [S, tx, rx]
        valid &= total_len > 1e-6

        # --- Occlusion: without refraction every segment must be free
        # of intersections (ignoring the reflecting triangles at its
        # endpoints); with refraction each blocker instead multiplies
        # the amplitude by its slab transmission coefficient
        trans = jnp.ones((s_count, num_tx, num_rx), jnp.complex64)
        if scene.num_triangles > 0:
            for k in range(depth + 1):
                o = pts[k].reshape(-1, 3)
                d = segs[k].reshape(-1, 3)
                excl_ids = None
                if depth > 0:
                    ids = []
                    for kk in (k - 1, k):
                        if 0 <= kk < depth:
                            ids.append(seq[:, kk])
                        else:
                            ids.append(jnp.full((s_count,), -1,
                                                seq.dtype))
                    excl = jnp.stack(ids, axis=1)      # [S, 2]
                    excl_ids = jnp.broadcast_to(
                        excl[:, None, None, :],
                        (s_count, num_tx, num_rx, 2)).reshape(-1, 2)
                if refraction:
                    t_seg = transmission_product(
                        o, d, tri, eta_tri, th_tri, lam,
                        excl_ids=excl_ids,
                        accel=getattr(self, "_accel", None))
                    trans = trans * t_seg.reshape(
                        s_count, num_tx, num_rx)
                else:
                    blocked = any_blocking_hit(
                        o, d, tri, excl_ids=excl_ids,
                        accel=getattr(self, "_accel", None))
                    valid &= ~blocked.reshape(s_count, num_tx, num_rx)

        # --- Polarized field transfer (Jones matrix cascade)
        # basis vectors transverse to the first segment
        e_a, e_b = _sph_basis(d_hat[0])        # [S,tx,rx,3] each
        jones = jnp.broadcast_to(
            jnp.eye(2, dtype=jnp.complex64),
            (s_count, num_tx, num_rx, 2, 2))
        for k in range(depth):
            d_in = d_hat[k]
            d_out = d_hat[k + 1]
            n_k = n_pl[:, None, None, k]
            n_k = jnp.where(
                jnp.sum(n_k * d_in, axis=-1, keepdims=True) > 0,
                -n_k, n_k)
            cos_i = jnp.clip(-jnp.sum(d_in * n_k, axis=-1),
                             0., 1.).astype(jnp.float32)
            # s (TE) axis; fall back to e_a at normal incidence
            e_s = jnp.cross(d_in, n_k)
            s_norm = jnp.linalg.norm(e_s, axis=-1, keepdims=True)
            e_s = jnp.where(s_norm > 1e-6, e_s / jnp.maximum(
                s_norm, 1e-30), e_a)
            e_p_in = jnp.cross(e_s, d_in)
            e_p_out = jnp.cross(e_s, d_out)
            # Fresnel coefficients
            eta = eta_tri[seq[:, k]][:, None, None]
            sin2 = 1. - cos_i ** 2
            root = jnp.sqrt(eta - sin2)
            r_s = (cos_i - root) / (cos_i + root)
            r_p = (eta * cos_i - root) / (eta * cos_i + root)
            s_coef = jnp.sqrt(jnp.maximum(
                1. - scat_tri[seq[:, k]][:, None, None] ** 2, 0.)
            ).astype(jnp.float32)
            r_s = r_s * s_coef
            r_p = r_p * s_coef
            # Basis rotation into (e_s, e_p_in)
            rot = jnp.stack(
                [jnp.stack([jnp.sum(e_s * e_a, -1),
                            jnp.sum(e_s * e_b, -1)], -1),
                 jnp.stack([jnp.sum(e_p_in * e_a, -1),
                            jnp.sum(e_p_in * e_b, -1)], -1)],
                axis=-2).astype(jnp.complex64)
            refl = jnp.zeros(rot.shape, jnp.complex64)
            refl = refl.at[..., 0, 0].set(r_s.astype(jnp.complex64))
            refl = refl.at[..., 1, 1].set(r_p.astype(jnp.complex64))
            jones = refl @ rot @ jones
            e_a, e_b = e_s, e_p_out

        # Project onto the receive spherical basis (arrival direction
        # u_r = -d_hat[-1]; e_theta(-u)=e_theta(u), e_phi(-u)=-e_phi(u))
        u_r = -d_hat[-1]
        e_tr, e_pr = _sph_basis(u_r)
        proj = jnp.stack(
            [jnp.stack([jnp.sum(e_tr * e_a, -1),
                        jnp.sum(e_tr * e_b, -1)], -1),
             jnp.stack([jnp.sum(e_pr * e_a, -1),
                        jnp.sum(e_pr * e_b, -1)], -1)],
            axis=-2).astype(jnp.complex64)
        jones = proj @ jones                    # [S,tx,rx,2,2]

        mag = (lam / (4. * PI * jnp.maximum(total_len, 1e-9))
               ).astype(jnp.float32)
        amp = mag * _phase_exp(total_len, lam) * trans
        tau = total_len / SPEED_OF_LIGHT
        return self._combine(scene, txs, rxs, d_hat[0], u_r, jones,
                             amp, valid, tau)

    # ------------------------------------------------------------------
    def _combine(self, scene, txs, rxs, d0_hat, u_r, jones, amp,
                 valid, tau):
        """Applies antenna patterns, synthetic-array phase offsets and
        Doppler to per-path Jones matrices, producing the Paths-layout
        output dict.

        d0_hat/u_r: [P,tx,rx,3] departure direction / arrival
        direction (pointing from the RX back along the last segment);
        jones [P,tx,rx,2,2] maps the TX spherical basis of ``d0_hat``
        to the RX spherical basis of ``u_r``; amp [P,tx,rx] carries
        spreading + propagation phase; tau in seconds."""
        lam = scene.wavelength

        # --- Antenna patterns in device-local frames
        theta_t_g, phi_t_g = _unit_to_angles(d0_hat)
        theta_r_g, phi_r_g = _unit_to_angles(u_r)

        rot_tx = np.stack([_rot_matrix(t.orientation) for t in txs])
        rot_rx = np.stack([_rot_matrix(r.orientation) for r in rxs])
        d0_loc = jnp.einsum("tij,stri->strj",
                            jnp.asarray(rot_tx), d0_hat)
        ur_loc = jnp.einsum("rij,stri->strj",
                            jnp.asarray(rot_rx), u_r)
        th_t_l, ph_t_l = _unit_to_angles(d0_loc)
        th_r_l, ph_r_l = _unit_to_angles(ur_loc)

        # F: ([S,tx,rx,ant] theta-comp, phi-comp)
        f_t_th, f_t_ph = scene.tx_array.field(th_t_l, ph_t_l)
        f_r_th, f_r_ph = scene.rx_array.field(th_r_l, ph_r_l)
        # Rotate local pattern components to the global basis: the
        # local spherical basis maps to the global one via the angle
        # between bases; compute via basis vectors
        e_th_t_l, e_ph_t_l = _sph_basis(d0_loc)
        e_th_t_g, e_ph_t_g = _sph_basis(d0_hat)
        # global field = R^T (local basis vectors) . components
        rt_t = jnp.swapaxes(jnp.asarray(rot_tx), -2, -1)
        e_th_t_gl = jnp.einsum("tij,strj->stri", rt_t, e_th_t_l)
        e_ph_t_gl = jnp.einsum("tij,strj->stri", rt_t, e_ph_t_l)
        # projections onto the global (theta, phi) basis
        m_tt = jnp.sum(e_th_t_g * e_th_t_gl, -1)
        m_tp = jnp.sum(e_th_t_g * e_ph_t_gl, -1)
        m_pt = jnp.sum(e_ph_t_g * e_th_t_gl, -1)
        m_pp = jnp.sum(e_ph_t_g * e_ph_t_gl, -1)
        f_t_th_g = (m_tt[..., None] * f_t_th
                    + m_tp[..., None] * f_t_ph)
        f_t_ph_g = (m_pt[..., None] * f_t_th
                    + m_pp[..., None] * f_t_ph)

        e_th_r_l, e_ph_r_l = _sph_basis(ur_loc)
        e_th_r_g, e_ph_r_g = _sph_basis(u_r)
        rt_r = jnp.swapaxes(jnp.asarray(rot_rx), -2, -1)
        e_th_r_gl = jnp.einsum("rij,strj->stri", rt_r, e_th_r_l)
        e_ph_r_gl = jnp.einsum("rij,strj->stri", rt_r, e_ph_r_l)
        w_tt = jnp.sum(e_th_r_g * e_th_r_gl, -1)
        w_tp = jnp.sum(e_th_r_g * e_ph_r_gl, -1)
        w_pt = jnp.sum(e_ph_r_g * e_th_r_gl, -1)
        w_pp = jnp.sum(e_ph_r_g * e_ph_r_gl, -1)
        f_r_th_g = (w_tt[..., None] * f_r_th
                    + w_tp[..., None] * f_r_ph)
        f_r_ph_g = (w_pt[..., None] * f_r_th
                    + w_pp[..., None] * f_r_ph)

        # --- Combine: a[s,tx,rx,ra,ta] =
        #   F_r^T . J . F_t * lam/(4 pi d) * exp(-j2 pi d/lam)
        f_t = jnp.stack([f_t_th_g, f_t_ph_g],
                        axis=-2).astype(jnp.complex64)  # [S,t,r,2,ta]
        f_r = jnp.stack([f_r_th_g, f_r_ph_g],
                        axis=-2).astype(jnp.complex64)  # [S,t,r,2,ra]
        field = jnp.einsum("stria,strij,strjb->strab",
                           f_r, jones, f_t)  # [S,t,r,ra,ta]

        # --- Array phase offsets (plane-wave / synthetic array)
        pos_t = jnp.asarray(scene.tx_array.positions(lam))  # [ta,3]
        pos_r = jnp.asarray(scene.rx_array.positions(lam))
        rot_pt = jnp.einsum("tij,aj->tai", rt_t, pos_t)
        rot_pr = jnp.einsum("rij,aj->rai", rt_r, pos_r)
        ph_t = jnp.exp(1j * (2. * PI / lam * jnp.einsum(
            "tai,stri->stra", rot_pt, d0_hat)).astype(jnp.float32))
        ph_r = jnp.exp(1j * (-2. * PI / lam * jnp.einsum(
            "rai,stri->stra", rot_pr, u_r)).astype(jnp.float32))
        a = (field * amp[..., None, None]
             * ph_r[..., :, None] * ph_t[..., None, :])

        # --- Doppler per path
        v_tx = jnp.asarray(np.stack([t.velocity for t in txs]))
        v_rx = jnp.asarray(np.stack([r.velocity for r in rxs]))
        fd = (scene.frequency / SPEED_OF_LIGHT) * (
            jnp.einsum("ti,stri->str", v_tx, d0_hat)
            + jnp.einsum("ri,stri->str", v_rx, u_r))

        # --- Mask invalid paths and reorder to Paths layout
        valid_c = valid.astype(jnp.complex64)
        a = a * valid_c[..., None, None]
        # [S,tx,rx,...] -> [rx, ra, tx, ta, S] etc.
        a = jnp.transpose(a, (2, 3, 1, 4, 0))
        out = {
            "a": a,
            "tau": jnp.transpose(jnp.where(valid, tau, -1.),
                                 (2, 1, 0)),
            "valid": jnp.transpose(valid, (2, 1, 0)),
            "theta_t": jnp.transpose(theta_t_g, (2, 1, 0)),
            "phi_t": jnp.transpose(phi_t_g, (2, 1, 0)),
            "theta_r": jnp.transpose(theta_r_g, (2, 1, 0)),
            "phi_r": jnp.transpose(phi_r_g, (2, 1, 0)),
            "doppler": jnp.transpose(jnp.where(valid, fd, 0.),
                                     (2, 1, 0)),
        }
        return out

    # ------------------------------------------------------------------
    def _eval_diffraction(self, scene, tri, wedges, tx_pos, rx_pos,
                          eta_tri, txs, rxs, th_tri=None,
                          refraction=False):
        """Evaluates first-order UTD diffraction off every wedge for
        all TX/RX pairs as one [W, tx, rx] batch.

        The diffraction point on each (straight) edge follows from the
        generalized Fermat principle in closed form: with (t, rho) the
        cylindrical coordinates of TX/RX about the edge line, the
        stationary point is t_d = (t_tx rho_rx + t_rx rho_tx) /
        (rho_tx + rho_rx), which also satisfies the Keller cone
        condition beta_0 = beta_0'."""
        lam = scene.wavelength
        k_wave = 2. * PI / lam
        origin = jnp.asarray(wedges["origin"])          # [W,3]
        e_hat = jnp.asarray(wedges["e_hat"])
        e_len = jnp.asarray(wedges["length"])           # [W]
        x_hat = jnp.asarray(wedges["x_hat"])
        y_hat = jnp.asarray(wedges["y_hat"])
        n_ang = jnp.asarray(wedges["n_angle"])          # [W]
        # host indexing: eta_tri is a NumPy constant (complex arrays
        # cannot be device_put on TPU; they embed as HLO literals)
        eta0 = np.asarray(eta_tri)[wedges["tri_0"]]
        etan = np.asarray(eta_tri)[wedges["tri_n"]]
        num_w = origin.shape[0]
        num_tx = tx_pos.shape[0]
        num_rx = rx_pos.shape[0]

        # cylindrical coordinates about the edge line
        rel_t = tx_pos[None] - origin[:, None]          # [W,T,3]
        t1 = jnp.sum(rel_t * e_hat[:, None], -1)        # [W,T]
        perp_t = rel_t - t1[..., None] * e_hat[:, None]
        rho1 = jnp.linalg.norm(perp_t, axis=-1)
        rel_r = rx_pos[None] - origin[:, None]          # [W,R,3]
        t2 = jnp.sum(rel_r * e_hat[:, None], -1)
        perp_r = rel_r - t2[..., None] * e_hat[:, None]
        rho2 = jnp.linalg.norm(perp_r, axis=-1)

        denom = rho1[:, :, None] + rho2[:, None]
        t_d = (t1[:, :, None] * rho2[:, None]
               + t2[:, None] * rho1[:, :, None]) \
            / jnp.maximum(denom, 1e-12)                 # [W,T,R]
        valid = ((t_d > 1e-6)
                 & (t_d < e_len[:, None, None] - 1e-6)
                 & (rho1[:, :, None] > 1e-4)
                 & (rho2[:, None, :] > 1e-4))
        q = origin[:, None, None] \
            + t_d[..., None] * e_hat[:, None, None]     # [W,T,R,3]
        s_i_vec = q - tx_pos[None, :, None]
        s_i = jnp.linalg.norm(s_i_vec, axis=-1)
        shat_i = s_i_vec / jnp.maximum(s_i[..., None], 1e-12)
        s_d_vec = rx_pos[None, None] - q
        s_d = jnp.linalg.norm(s_d_vec, axis=-1)
        shat_d = s_d_vec / jnp.maximum(s_d[..., None], 1e-12)

        # azimuths about the edge, measured from the 0-face through
        # the exterior region
        u_p = perp_t / jnp.maximum(rho1[..., None], 1e-12)
        phi_p = jnp.arctan2(
            jnp.sum(u_p * y_hat[:, None], -1),
            jnp.sum(u_p * x_hat[:, None], -1)) % (2. * PI)  # [W,T]
        u_d = perp_r / jnp.maximum(rho2[..., None], 1e-12)
        phi = jnp.arctan2(
            jnp.sum(u_d * y_hat[:, None], -1),
            jnp.sum(u_d * x_hat[:, None], -1)) % (2. * PI)  # [W,R]
        valid &= (phi_p[:, :, None] <= n_ang[:, None, None]) \
            & (phi[:, None, :] <= n_ang[:, None, None])

        cos_b = jnp.sum(e_hat[:, None, None] * shat_i, -1)
        sin_b0 = jnp.sqrt(jnp.maximum(1. - cos_b ** 2, 1e-12))
        valid &= sin_b0 > 1e-3
        l_par = s_i * s_d * sin_b0 ** 2 \
            / jnp.maximum(s_i + s_d, 1e-12)
        n_par = (n_ang / PI)[:, None, None]
        d_s, d_h = utd_coefficients(
            phi[:, None, :], phi_p[:, :, None], n_par,
            k_wave * l_par, sin_b0, k_wave,
            eta0[:, None, None], etan[:, None, None])

        # edge-fixed polarization bases (McNamara convention)
        e_b = jnp.broadcast_to(e_hat[:, None, None], shat_i.shape)
        cr_i = jnp.cross(e_b, shat_i)
        phi_hat_i = -cr_i / jnp.maximum(
            jnp.linalg.norm(cr_i, axis=-1, keepdims=True), 1e-12)
        beta_hat_i = jnp.cross(phi_hat_i, shat_i)
        cr_d = jnp.cross(e_b, shat_d)
        phi_hat_d = cr_d / jnp.maximum(
            jnp.linalg.norm(cr_d, axis=-1, keepdims=True), 1e-12)
        beta_hat_d = jnp.cross(phi_hat_d, shat_d)

        e_th_i, e_ph_i = _sph_basis(shat_i)
        rot_in = jnp.stack(
            [jnp.stack([jnp.sum(beta_hat_i * e_th_i, -1),
                        jnp.sum(beta_hat_i * e_ph_i, -1)], -1),
             jnp.stack([jnp.sum(phi_hat_i * e_th_i, -1),
                        jnp.sum(phi_hat_i * e_ph_i, -1)], -1)],
            axis=-2).astype(jnp.complex64)
        u_r = -shat_d
        e_tr, e_pr = _sph_basis(u_r)
        proj = jnp.stack(
            [jnp.stack([jnp.sum(e_tr * beta_hat_d, -1),
                        jnp.sum(e_tr * phi_hat_d, -1)], -1),
             jnp.stack([jnp.sum(e_pr * beta_hat_d, -1),
                        jnp.sum(e_pr * phi_hat_d, -1)], -1)],
            axis=-2).astype(jnp.complex64)
        dmat = jnp.zeros(rot_in.shape, jnp.complex64)
        dmat = dmat.at[..., 0, 0].set(-d_s.astype(jnp.complex64))
        dmat = dmat.at[..., 1, 1].set(-d_h.astype(jnp.complex64))
        jones = proj @ dmat @ rot_in

        # spreading for a straight edge with spherical incidence
        total_len = s_i + s_d
        spread = jnp.sqrt(1. / jnp.maximum(
            s_i * s_d * total_len, 1e-12))
        amp = ((lam / (4. * PI) * spread).astype(jnp.float32)
               * _phase_exp(total_len, lam))

        # occlusion of both segments (the wedge faces are excluded:
        # Q lies exactly on them); with refraction, blockers
        # attenuate via the slab coefficient instead
        excl = np.stack([wedges["tri_0"], wedges["tri_n"]], axis=1)
        excl_b = jnp.asarray(np.broadcast_to(
            excl[:, None, None], (num_w, num_tx, num_rx, 2)
        ).reshape(-1, 2))
        o1 = jnp.broadcast_to(tx_pos[None, :, None],
                              q.shape).reshape(-1, 3)
        accel = getattr(self, "_accel", None)
        if refraction:
            t1 = transmission_product(
                o1, s_i_vec.reshape(-1, 3), tri, eta_tri, th_tri,
                lam, excl_ids=excl_b, accel=accel)
            t2 = transmission_product(
                q.reshape(-1, 3), s_d_vec.reshape(-1, 3), tri,
                eta_tri, th_tri, lam, excl_ids=excl_b, accel=accel)
            amp = amp * (t1 * t2).reshape(num_w, num_tx, num_rx)
        else:
            blocked1 = any_blocking_hit(
                o1, s_i_vec.reshape(-1, 3), tri,
                excl_ids=excl_b, accel=accel)
            blocked2 = any_blocking_hit(
                q.reshape(-1, 3), s_d_vec.reshape(-1, 3), tri,
                excl_ids=excl_b, accel=accel)
            valid &= ~(blocked1 | blocked2).reshape(
                num_w, num_tx, num_rx)

        tau = total_len / SPEED_OF_LIGHT
        return self._combine(scene, txs, rxs, shat_i, u_r, jones,
                             amp, valid, tau)

    # ------------------------------------------------------------------
    @staticmethod
    def _sample_scatter_points(scene, scat_tri, num_samples, seed,
                               rd):
        """Host-side area-weighted sampling of scattering surfaces.

        Returns (points [N,3], tri_idx [N], d_area) or None when no
        material scatters."""
        tri_np = np.asarray(scene.triangles)
        v0, v1, v2 = tri_np[:, 0], tri_np[:, 1], tri_np[:, 2]
        areas = 0.5 * np.linalg.norm(
            np.cross(v1 - v0, v2 - v0), axis=1)
        w_area = areas * (np.asarray(scat_tri) > 0.)
        total_area = float(w_area.sum())
        if total_area <= 0.:
            return None
        rng = np.random.default_rng(seed)
        tri_idx = rng.choice(tri_np.shape[0], size=num_samples,
                             p=w_area / total_area).astype(np.int32)
        r_a = np.sqrt(rng.random(num_samples))
        r_b = rng.random(num_samples)
        bary = np.stack([1. - r_a, r_a * (1. - r_b), r_a * r_b],
                        axis=1)                         # [N,3]
        p = np.einsum("nk,nkd->nd", bary, tri_np[tri_idx])
        # effective area represented by each sample (importance-
        # weighted: samples are drawn proportional to area)
        return p.astype(rd), tri_idx, total_area / num_samples

    def _eval_scattering(self, scene, tri, normals, tx_pos, rx_pos,
                         eta_tri, p, tri_idx, d_area, num_samples,
                         seed, txs, rxs, th_tri=None,
                         refraction=False):
        """Single-bounce diffuse scattering via area-weighted Monte
        Carlo over the scene surface (effective-roughness model with
        per-material configurable re-radiation lobes: Lambertian,
        directive, or backscattering — see rt/scattering_pattern.py).

        Each sample point p contributes mean received power
        (lam/4pi)^2 * cos(theta_i) * dA * S^2 * Gamma^2
        * f(k_i, k_s) / (r1^2 r2^2) with dA = total_area / N (for the
        Lambertian lobe f = cos(theta_s)/pi) —
        energy-consistent with the sqrt(1-S^2) reduction the specular
        evaluator applies to reflected fields.  Scattered paths are
        depolarized with uniform random phases (power-calibrated in
        expectation)."""
        lam = scene.wavelength
        scat_np = np.array(
            [m.scattering_coefficient
             for m in scene.triangle_materials], np.float32)
        s_coef = jnp.asarray(scat_np[tri_idx])          # [N]
        n_s = normals[jnp.asarray(tri_idx)]             # [N,3]
        num_tx = tx_pos.shape[0]
        num_rx = rx_pos.shape[0]

        s1_vec = p[:, None] - tx_pos[None]              # [N,T,3]
        s1 = jnp.linalg.norm(s1_vec, axis=-1)
        shat1 = s1_vec / jnp.maximum(s1[..., None], 1e-12)
        # orient the normal towards the TX
        flip = jnp.sign(jnp.sum(n_s[:, None] * (-shat1), -1))
        n_or = n_s[:, None] * jnp.where(flip == 0., 1., flip)[
            ..., None]                                  # [N,T,3]
        cos_i = jnp.clip(-jnp.sum(shat1 * n_or, -1), 0., 1.)  # [N,T]

        s2_vec = rx_pos[None, None] - p[:, None, None]  # [N,1,R,3]
        s2 = jnp.linalg.norm(s2_vec, axis=-1)           # [N,1,R]
        shat2 = s2_vec / jnp.maximum(s2[..., None], 1e-12)
        cos_s = jnp.sum(shat2 * n_or[:, :, None], -1)   # [N,T,R]
        valid = (cos_s > 1e-6) & (cos_i[:, :, None] > 1e-6) \
            & (s1[:, :, None] > 1e-3) & (s2 > 1e-3)

        eta_hit = np.asarray(eta_tri)[tri_idx]     # complex64 const
        cos_f = cos_i.astype(jnp.float32)
        sin2 = 1. - cos_f ** 2
        root = jnp.sqrt(eta_hit[:, None] - sin2)
        r_s = (cos_f - root) / (cos_f + root)
        r_p = (eta_hit[:, None] * cos_f - root) \
            / (eta_hit[:, None] * cos_f + root)
        gamma2 = 0.5 * (jnp.abs(r_s) ** 2
                        + jnp.abs(r_p) ** 2)            # [N,T]

        # Re-radiation pattern f(k_i, k_s): per-material lobes
        # (Lambertian / directive / backscattering), batched over the
        # mixed-material sample set via host-gathered coefficient
        # tables (see rt/scattering_pattern.py).
        from .scattering_pattern import (LambertianPattern,
                                         pack_patterns)
        default_pat = LambertianPattern()
        mats = scene.triangle_materials
        pats = [getattr(m, "scattering_pattern", None) or default_pat
                for m in mats]
        uniq = {}
        pat_of_tri = np.empty(len(pats), np.int32)
        uniq_pats = []
        for j, pat in enumerate(pats):
            can = pat.canonical()
            if can not in uniq:
                uniq[can] = len(uniq_pats)
                uniq_pats.append(pat)
            pat_of_tri[j] = uniq[can]
        packed = pack_patterns(uniq_pats)
        sel = pat_of_tri[tri_idx]                       # [N] host
        # cos_s < 0 (RX behind the surface) is invalidated by `valid`;
        # clip here so a2 stays >= 0 and sqrt(2*a2) cannot produce a
        # NaN that would survive the multiplicative valid mask.
        cos_s_pos = jnp.clip(cos_s, 0., 1.)
        if bool(packed["is_lamb"].all()):
            f_pat = cos_s_pos / PI
        else:
            lam_w = packed["lambda_"][sel]              # [N]
            a_r = packed["a_r"][sel]
            a_i = packed["a_i"][sel]
            br = packed["Br"][sel]                      # [N, W]
            bi = packed["Bi"][sel]
            is_lamb = packed["is_lamb"][sel]
            sin2_i = 1. - cos_f ** 2                    # [N,T]
            n_w = br.shape[-1]
            powers = jnp.stack(
                [sin2_i ** w for w in range(n_w)], -1)  # [N,T,W]
            norm_r = (packed["Ar"][sel][:, None] + cos_f
                      * jnp.einsum("nw,ntw->nt",
                                   jnp.asarray(br), powers))
            norm_i = (packed["Ai"][sel][:, None] + cos_f
                      * jnp.einsum("nw,ntw->nt",
                                   jnp.asarray(bi), powers))
            dot_in = jnp.sum(shat1 * n_or, -1,
                             keepdims=True)             # [N,T,1]
            k_r = shat1 - 2. * dot_in * n_or            # [N,T,3]
            cos_pr = jnp.clip(
                jnp.sum(k_r[:, :, None] * shat2, -1), -1., 1.)
            cos_pi = jnp.clip(
                -jnp.sum(shat1[:, :, None] * shat2, -1), -1., 1.)
            f_dir = (lam_w[:, None, None]
                     * ((1. + cos_pr) / 2.) ** a_r[:, None, None]
                     / jnp.maximum(norm_r[:, :, None], 1e-12)
                     + (1. - lam_w)[:, None, None]
                     * ((1. + cos_pi) / 2.) ** a_i[:, None, None]
                     / jnp.maximum(norm_i[:, :, None], 1e-12))
            f_pat = jnp.where(jnp.asarray(is_lamb)[:, None, None],
                              cos_s_pos / PI, f_dir)
        a2 = ((lam / (4. * PI)) ** 2
              * cos_i[:, :, None] * d_area
              * (s_coef[:, None] ** 2 * gamma2)[:, :, None] * f_pat
              / jnp.maximum((s1[:, :, None] * s2) ** 2, 1e-12))
        a2 = jnp.where(valid, a2, 0.)
        total_len = s1[:, :, None] + s2                 # [N,T,R]
        # factor 2: E|Fr^T J Ft|^2 = 1/2 |Fr|^2 |Ft|^2 for the random
        # depolarizing Jones matrix below
        key = jax.random.PRNGKey(seed)
        chi0 = jax.random.uniform(
            key, (num_samples, num_tx, num_rx), jnp.float32,
            maxval=2. * PI)
        amp = (jnp.sqrt(2. * a2).astype(jnp.float32)
               * jnp.exp(1j * chi0) * _phase_exp(total_len, lam))
        chi = jax.random.uniform(
            jax.random.fold_in(key, 1),
            (num_samples, num_tx, num_rx, 2, 2), jnp.float32,
            maxval=2. * PI)
        jones = jnp.exp(1j * chi) / np.float32(np.sqrt(2.))

        # occlusion of both segments, excluding the sampled triangle
        excl_b = jnp.asarray(np.broadcast_to(
            tri_idx[:, None, None, None],
            (num_samples, num_tx, num_rx, 1)).reshape(-1, 1))
        o1 = jnp.broadcast_to(
            tx_pos[None, :, None],
            (num_samples, num_tx, num_rx, 3)).reshape(-1, 3)
        d1 = jnp.broadcast_to(
            -s1_vec[:, :, None],
            (num_samples, num_tx, num_rx, 3)).reshape(-1, 3)
        accel = getattr(self, "_accel", None)
        o2 = jnp.broadcast_to(
            p[:, None, None],
            (num_samples, num_tx, num_rx, 3)).reshape(-1, 3)
        d2 = jnp.broadcast_to(
            s2_vec, (num_samples, num_tx, num_rx, 3)).reshape(-1, 3)
        if refraction:
            t1 = transmission_product(
                o1, -d1, tri, eta_tri, th_tri, lam,
                excl_ids=excl_b, accel=accel)
            t2 = transmission_product(
                o2, d2, tri, eta_tri, th_tri, lam,
                excl_ids=excl_b, accel=accel)
            amp = amp * (t1 * t2).reshape(
                num_samples, num_tx, num_rx)
        else:
            blocked1 = any_blocking_hit(o1, -d1, tri,
                                        excl_ids=excl_b, accel=accel)
            blocked2 = any_blocking_hit(o2, d2, tri,
                                        excl_ids=excl_b, accel=accel)
            valid &= ~(blocked1 | blocked2).reshape(
                num_samples, num_tx, num_rx)

        d0_hat = jnp.broadcast_to(
            shat1[:, :, None], (num_samples, num_tx, num_rx, 3))
        u_r = jnp.broadcast_to(
            -shat2, (num_samples, num_tx, num_rx, 3))
        tau = total_len / SPEED_OF_LIGHT
        return self._combine(scene, txs, rxs, d0_hat, u_r, jones,
                             amp, valid, tau)

    @staticmethod
    def _in_triangle(p, a, b, c):
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
