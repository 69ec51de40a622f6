"""TPU-native ray-tracing acceleration: dense cluster culling.

The reference (sionna.rt) traces rays through Mitsuba's C++ BVH
(`/root/reference/src/sionna/rt/scene.py` delegates to
``mitsuba.load_*``; SURVEY.md 2.11 lists the BVH as the native hot
kernel).  Pointer-chasing a BVH is hostile to a TPU — divergent
control flow, scalar gathers, no vectorization — so this module uses
a two-level dense scheme instead:

1.  A native C++ builder (``native/bvh.cpp``, median-split BVH order)
    groups triangles into spatially coherent clusters of fixed size
    ``C`` (padding only the single global tail cluster).
2.  On device, a query slab-tests every ray against every cluster
    AABB — one dense ``[R, n_clusters]`` VPU computation — selects
    each ray's ``k_max`` nearest-entry clusters with ``lax.top_k``
    (default 32, round-5 retune: the 100k-triangle city nearest-hit
    measured 354 -> 226 ms/100k rays vs k_max=64, with the dense
    repair pass still rare; exactness is certificate-guaranteed at
    ANY k_max),
    and Moller-Trumbore-tests them in a fixed-trip ``lax.scan``,
    ``group`` gathered clusters per step.  Control flow is fully
    static: data-dependent ``while_loop`` steps cost ~1 ms of host
    sync each on remote-attached TPUs, so the only data-dependent
    branches are two scalar ``lax.cond``s — one skipping all-miss ray
    chunks, one running a dense all-cluster repair sweep for the rare
    rays whose nearest hit is not *provably* resolved within their
    k_max nearest clusters (a hit inside a box can never be closer
    than the box's entry distance, so ``best_t <= t_entry[k_max-1]``
    certifies exactness).  Results therefore always match the dense
    sweep bit-for-bit.

Everything is static-shaped and jittable; the host-side build is a
single permutation pass cached per geometry fingerprint.
"""

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["TriangleAccel", "build_accel", "nearest_hit_accel",
           "any_blocking_hit_accel", "transmission_product_accel",
           "transmission_jones_product_accel", "cluster_permutation"]

_EPS = 1e-5

# ----------------------------------------------------------------------
# Native builder (ctypes; NumPy fallback)
# ----------------------------------------------------------------------
_NATIVE = None
_NATIVE_TRIED = False


def _native_lib():
    """Compiles and loads the C++ cluster builder on first use.

    The shared object is built next to the source (inside the
    package) and keyed by a hash of the source so edits recompile.
    Returns None when no compiler is available — callers fall back to
    the NumPy implementation of the same algorithm."""
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    src = os.path.join(os.path.dirname(__file__), "native", "bvh.cpp")
    try:
        with open(src, "rb") as f:
            tag = hashlib.blake2b(f.read(), digest_size=8).hexdigest()
        build_dir = os.path.join(os.path.dirname(src), "_build")
        os.makedirs(build_dir, exist_ok=True)
        lib_path = os.path.join(build_dir, f"libsionna_bvh_{tag}.so")
        if not os.path.exists(lib_path):
            with tempfile.TemporaryDirectory(dir=build_dir) as td:
                tmp = os.path.join(td, "lib.so")
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", src, "-o", tmp],
                    check=True, capture_output=True)
                os.replace(tmp, lib_path)
        lib = ctypes.CDLL(lib_path)
        lib.sionna_bvh_cluster.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
        lib.sionna_bvh_cluster.restype = None
        _NATIVE = lib
    except (OSError, subprocess.CalledProcessError):
        _NATIVE = None
    return _NATIVE


def _cluster_permutation_numpy(tris, cluster_size):
    """NumPy median-split fallback — same algorithm as bvh.cpp."""
    cent = tris.mean(axis=1)                            # [T, 3]
    out = np.empty(tris.shape[0], np.int32)
    cursor = [0]

    def split(ids):
        n = ids.shape[0]
        if n <= cluster_size:
            out[cursor[0]:cursor[0] + n] = ids
            cursor[0] += n
            return
        c = cent[ids]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        left_n = (n // 2 // cluster_size) * cluster_size
        left_n = min(max(left_n, cluster_size), n - 1)
        part = np.argpartition(c[:, axis], left_n)
        split(ids[part[:left_n]])
        split(ids[part[left_n:]])

    import sys
    limit = sys.getrecursionlimit()
    depth_bound = 2 * int(np.ceil(np.log2(
        max(tris.shape[0] / max(cluster_size, 1), 2)))) + 64
    sys.setrecursionlimit(max(limit, depth_bound + limit))
    try:
        split(np.arange(tris.shape[0], dtype=np.int32))
    finally:
        sys.setrecursionlimit(limit)
    return out


def cluster_permutation(tris, cluster_size=64):
    """[T] int32 permutation grouping ``tris`` [T, 3, 3] into
    spatially coherent runs of ``cluster_size`` (native C++ builder
    when available, NumPy otherwise)."""
    num_tri = tris.shape[0]
    if num_tri == 0:
        return np.zeros((0,), np.int32)
    lib = _native_lib()
    if lib is None:
        return _cluster_permutation_numpy(
            np.asarray(tris, np.float32), cluster_size)
    flat = np.ascontiguousarray(tris, np.float32).reshape(-1)
    perm = np.empty(num_tri, np.int32)
    lib.sionna_bvh_cluster(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_tri, cluster_size,
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return perm


# ----------------------------------------------------------------------
# Device-side structure
# ----------------------------------------------------------------------
class TriangleAccel(NamedTuple):
    """Clustered geometry (a pytree of device arrays).

    tri_c  : [n_c, C, 3, 3] clustered triangles (tail padded with
             degenerate zero-triangles that can never be hit)
    old_id : [n_c, C] int32 original triangle index (-1 on padding)
    lo, hi : [n_c, 3] cluster AABBs
    """
    tri_c: jnp.ndarray
    old_id: jnp.ndarray
    lo: jnp.ndarray
    hi: jnp.ndarray

    @property
    def num_clusters(self):
        return self.tri_c.shape[0]

    @property
    def cluster_size(self):
        return self.tri_c.shape[1]


_ACCEL_CACHE = {}
_ACCEL_CACHE_MAX = 8


def build_accel(tris, cluster_size=64, dtype=None):
    """Builds (and caches, keyed by geometry bytes) a TriangleAccel
    from host triangles [T, 3, 3]."""
    tris = np.asarray(tris)
    if dtype is None:
        dtype = tris.dtype
    key = (hashlib.blake2b(
        np.ascontiguousarray(tris, np.float32).tobytes(),
        digest_size=16).hexdigest(), cluster_size, np.dtype(dtype).str,
        jax.default_backend())
    hitv = _ACCEL_CACHE.get(key)
    if hitv is not None:
        return hitv
    num_tri = tris.shape[0]
    perm = cluster_permutation(tris, cluster_size)
    n_c = -(-num_tri // cluster_size)
    pad = n_c * cluster_size - num_tri
    tri_sorted = tris[perm]
    tri_p = np.concatenate(
        [tri_sorted, np.zeros((pad, 3, 3), tris.dtype)], axis=0)
    old_id = np.concatenate(
        [perm, np.full((pad,), -1, np.int32)]).astype(np.int32)
    tri_c = tri_p.reshape(n_c, cluster_size, 3, 3)
    # AABB over real triangles only (padding is all-zeros; excluding
    # it keeps boxes tight).  Tiny epsilon guards watertightness.
    verts = tri_c.reshape(n_c, -1, 3)
    counts = np.minimum(
        np.maximum(num_tri - np.arange(n_c) * cluster_size, 1),
        cluster_size)
    lo = np.empty((n_c, 3), tris.dtype)
    hi = np.empty((n_c, 3), tris.dtype)
    for i in range(n_c):
        v = verts[i, :counts[i] * 3]
        lo[i] = v.min(axis=0)
        hi[i] = v.max(axis=0)
    margin = 1e-4 * np.maximum(np.abs(lo), np.abs(hi)) + 1e-6
    accel = TriangleAccel(
        tri_c=jnp.asarray(tri_c.astype(dtype)),
        old_id=jnp.asarray(old_id.reshape(n_c, cluster_size)),
        lo=jnp.asarray((lo - margin).astype(dtype)),
        hi=jnp.asarray((hi + margin).astype(dtype)))
    if len(_ACCEL_CACHE) >= _ACCEL_CACHE_MAX:
        _ACCEL_CACHE.pop(next(iter(_ACCEL_CACHE)))
    _ACCEL_CACHE[key] = accel
    return accel


# ----------------------------------------------------------------------
# Jittable queries
# ----------------------------------------------------------------------
def _slab_entry(orig, dirs, lo, hi, t_hi):
    """Ray/AABB slab test.  orig, dirs: [R, 3]; lo, hi: [n_c, 3].

    Returns t_entry [R, n_c]: the entry parameter (clamped to 0) for
    rays that intersect the box within (0, t_hi), +inf otherwise.
    Computed axis-by-axis so no [R, n_c, 3] intermediate
    materializes."""
    inv = 1. / jnp.where(jnp.abs(dirs) < 1e-30,
                         jnp.asarray(1e-30, dirs.dtype), dirs)
    tmin = None
    tmax = None
    for a in range(3):
        t0 = (lo[None, :, a] - orig[:, None, a]) * inv[:, None, a]
        t1 = (hi[None, :, a] - orig[:, None, a]) * inv[:, None, a]
        near = jnp.minimum(t0, t1)
        far = jnp.maximum(t0, t1)
        tmin = near if tmin is None else jnp.maximum(tmin, near)
        tmax = far if tmax is None else jnp.minimum(tmax, far)
    t_entry = jnp.maximum(tmin, 0.)
    ok = (tmax >= t_entry) & (t_entry < t_hi)
    return jnp.where(ok, t_entry, jnp.inf)


def _mt_per_ray(orig, dirs, tri):
    """Moller-Trumbore where each ray has its own triangle set.

    orig/dirs: [R, 3]; tri: [R, C, 3, 3].  Returns (t, hit) [R, C].
    Same tolerances as solver.moller_trumbore."""
    v0 = tri[:, :, 0]
    e1 = tri[:, :, 1] - v0
    e2 = tri[:, :, 2] - v0
    d = dirs[:, None, :]
    p = jnp.cross(d, e2)
    det = jnp.sum(p * e1, axis=-1)                     # [R, C]
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1. / det, 0.)
    s = orig[:, None, :] - v0
    u = jnp.sum(s * p, axis=-1) * inv_det
    q = jnp.cross(s, e1)
    v = jnp.sum(d * q, axis=-1) * inv_det
    t = jnp.sum(e2 * q, axis=-1) * inv_det
    hit = ((jnp.abs(det) > 1e-12) & (u >= -1e-9) & (v >= -1e-9)
           & (u + v <= 1. + 1e-9) & (t > _EPS))
    return t, hit


def _ray_chunks(orig, dirs, chunk):
    """Pads and reshapes rays into [n_chunks, chunk, 3] pairs."""
    num_rays = orig.shape[0]
    n_chunks = -(-num_rays // chunk)
    pad = n_chunks * chunk - num_rays
    o = jnp.concatenate(
        [orig, jnp.zeros((pad, 3), orig.dtype)], axis=0)
    # Padding rays get a fixed direction so slab/MT math stays finite.
    d = jnp.concatenate(
        [dirs, jnp.broadcast_to(
            jnp.asarray([0., 0., 1.], dirs.dtype), (pad, 3))], axis=0)
    return (o.reshape(n_chunks, chunk, 3),
            d.reshape(n_chunks, chunk, 3), num_rays)


def _top_clusters(t_entry, k_max, group):
    """The ``kk`` nearest-entry cluster ids per ray (ascending entry
    time), padded to a multiple of ``group``.  Padding repeats
    cluster id 0 with +inf entry — re-testing a real cluster is
    correct (hit accumulation is idempotent), so padded slots need no
    masking.  Returns (ids [R, kk'], t_sort [R, kk'], n_steps,
    v_last [R] the kk-th entry time, cnt [R] entered-cluster
    counts)."""
    n_c = t_entry.shape[1]
    kk = min(k_max, n_c)
    cnt = jnp.sum(jnp.isfinite(t_entry), axis=1)
    neg, ids = jax.lax.top_k(-t_entry, kk)
    t_sort = -neg
    v_last = t_sort[:, -1]
    pad = (-kk) % group
    if pad:
        ids = jnp.pad(ids, ((0, 0), (0, pad)))
        t_sort = jnp.pad(t_sort, ((0, 0), (0, pad)),
                         constant_values=jnp.inf)
    return (ids.astype(jnp.int32), t_sort, (kk + pad) // group,
            v_last, cnt)


def _dense_sweep(o, d, accel, mode, excl=None, tri_chunk_clusters=128):
    """Exact fallback sweep over ALL clusters in fixed-size chunks
    (a static scan — no data-dependent control flow).  mode
    "nearest" -> (t_min, idx); mode "occl" -> blocked."""
    n_c = accel.num_clusters
    csz = accel.cluster_size
    r = o.shape[0]
    g = min(tri_chunk_clusters, n_c)
    n_steps = -(-n_c // g)
    cids = jnp.arange(n_steps * g, dtype=jnp.int32) % n_c
    cids = cids.reshape(n_steps, g)

    def body(carry, cid):
        tri = accel.tri_c[cid].reshape(1, g * csz, 3, 3)
        ids = accel.old_id[cid].reshape(1, g * csz)
        t, hit = _mt_per_ray(o, d, jnp.broadcast_to(
            tri, (r, g * csz, 3, 3)))
        if mode == "nearest":
            best_t, best_id = carry
            t = jnp.where(hit & (ids >= 0), t, jnp.inf)
            i_loc = jnp.argmin(t, axis=-1)
            t_loc = jnp.take_along_axis(t, i_loc[:, None], axis=1)[:, 0]
            id_loc = jnp.take_along_axis(
                jnp.broadcast_to(ids, t.shape),
                i_loc[:, None], axis=1)[:, 0]
            better = t_loc < best_t
            return (jnp.where(better, t_loc, best_t),
                    jnp.where(better, id_loc, best_id)), None
        blocked = carry
        b = hit & (ids >= 0) & (t > 1e-4) & (t < 1. - 1e-4)
        if excl is not None:
            b &= ~jnp.any(
                ids[:, :, None] == excl[:, None, :], axis=-1)
        return blocked | jnp.any(b, axis=-1), None

    if mode == "nearest":
        init = (jnp.full((r,), jnp.inf, o.dtype),
                jnp.zeros((r,), jnp.int32))
    else:
        init = jnp.zeros((r,), bool)
    out, _ = jax.lax.scan(body, init, cids)
    return out


def nearest_hit_accel(orig, dirs, accel, ray_chunk=8192, group=16,
                      k_max=32):
    """Nearest intersection per ray through the cluster structure.

    Control flow is static — this backend pays ~1 ms of host-sync
    per data-dependent ``while_loop`` step, so instead each ray's
    ``k_max`` nearest-entry clusters (``lax.top_k`` on the slab entry
    times) are tested in a fixed-trip scan, ``group`` clusters per
    step.  Exactness is restored by construction: a ray is proven
    resolved when its best hit is no farther than the k_max-th entry
    time (no unvisited cluster can contain a closer hit) or it
    entered <= k_max clusters; the rare rest are re-solved by a dense
    all-cluster sweep under a scalar ``lax.cond`` that usually never
    executes.
    Returns (t_min [R], tri_idx(original ids) [R], has_hit [R])."""
    big = jnp.asarray(jnp.inf, orig.dtype)
    csz = accel.cluster_size

    def one_chunk(o, d):
        r = o.shape[0]
        t_entry = _slab_entry(o, d, accel.lo, accel.hi, big)
        ids, t_sort, n_steps, v_last, cnt = _top_clusters(
            t_entry, k_max, group)

        def body(carry, k):
            best_t, best_id = carry
            cid = jax.lax.dynamic_slice_in_dim(
                ids, k * group, group, axis=1)          # [R, G]
            tri = accel.tri_c[cid].reshape(r, group * csz, 3, 3)
            eid = accel.old_id[cid].reshape(r, group * csz)
            t, hit = _mt_per_ray(o, d, tri)
            t = jnp.where(hit & (eid >= 0), t, jnp.inf)
            i_loc = jnp.argmin(t, axis=-1)
            t_loc = jnp.take_along_axis(
                t, i_loc[:, None], axis=1)[:, 0]
            id_loc = jnp.take_along_axis(
                eid, i_loc[:, None].astype(jnp.int32), axis=1)[:, 0]
            better = t_loc < best_t
            return (jnp.where(better, t_loc, best_t),
                    jnp.where(better, id_loc, best_id)), None

        init = (jnp.full((r,), jnp.inf, o.dtype),
                jnp.zeros((r,), jnp.int32))

        def process(_):
            (best_t, best_id), _ = jax.lax.scan(
                body, init, jnp.arange(n_steps))
            return best_t, best_id

        # skip fully-missing chunks (e.g. sky rays) with one scalar
        # cond; then repair any unproven rays with the dense sweep
        best_t, best_id = jax.lax.cond(
            jnp.any(cnt > 0), process, lambda _: init, None)
        exact = (cnt <= k_max) | (best_t <= v_last)

        def repair(_):
            d_t, d_id = _dense_sweep(o, d, accel, "nearest")
            return (jnp.where(exact, best_t, d_t),
                    jnp.where(exact, best_id, d_id))

        return jax.lax.cond(jnp.all(exact),
                            lambda _: (best_t, best_id), repair, None)

    num_rays = orig.shape[0]
    if num_rays <= ray_chunk:
        t_min, idx = one_chunk(orig, dirs)
        return t_min, idx, jnp.isfinite(t_min)
    o_c, d_c, _ = _ray_chunks(orig, dirs, ray_chunk)

    def body(_, args):
        o, d = args
        return None, one_chunk(o, d)

    _, (t_c, i_c) = jax.lax.scan(body, None, (o_c, d_c))
    t_min = t_c.reshape(-1)[:num_rays]
    idx = i_c.reshape(-1)[:num_rays]
    return t_min, idx, jnp.isfinite(t_min)


def any_blocking_hit_accel(orig, dirs, accel, excl_ids=None,
                           ray_chunk=8192, group=16, k_max=32):
    """Segment occlusion through the cluster structure.

    Same semantics as solver.any_blocking_hit: whether the segment
    [orig, orig + dirs] hits any triangle with parameter in
    (1e-4, 1 - 1e-4), ignoring original triangle ids in ``excl_ids``
    [R, K].  Static control flow like :func:`nearest_hit_accel`;
    exact — rays that entered more than ``k_max`` clusters without a
    blocker are re-solved densely under a scalar cond."""
    one = jnp.asarray(1., orig.dtype)
    csz = accel.cluster_size

    def one_chunk(o, d, excl):
        r = o.shape[0]
        t_entry = _slab_entry(o, d, accel.lo, accel.hi, one)
        ids, t_sort, n_steps, _, cnt = _top_clusters(
            t_entry, k_max, group)

        def body(blocked, k):
            cid = jax.lax.dynamic_slice_in_dim(
                ids, k * group, group, axis=1)
            tri = accel.tri_c[cid].reshape(r, group * csz, 3, 3)
            eid = accel.old_id[cid].reshape(r, group * csz)
            t, hit = _mt_per_ray(o, d, tri)
            b = hit & (eid >= 0) & (t > 1e-4) & (t < 1. - 1e-4)
            if excl is not None:
                b &= ~jnp.any(
                    eid[:, :, None] == excl[:, None, :], axis=-1)
            return blocked | jnp.any(b, axis=-1), None

        init = jnp.zeros((r,), bool)

        def process(_):
            blocked, _ = jax.lax.scan(body, init, jnp.arange(n_steps))
            return blocked

        blocked = jax.lax.cond(
            jnp.any(cnt > 0), process, lambda _: init, None)
        exact = blocked | (cnt <= k_max)

        def repair(_):
            d_b = _dense_sweep(o, d, accel, "occl", excl=excl)
            return blocked | (~exact & d_b)

        return jax.lax.cond(jnp.all(exact), lambda _: blocked,
                            repair, None)

    num_rays = orig.shape[0]
    if num_rays <= ray_chunk:
        return one_chunk(orig, dirs, excl_ids)
    o_c, d_c, _ = _ray_chunks(orig, dirs, ray_chunk)
    if excl_ids is not None:
        k_e = excl_ids.shape[1]
        n_chunks = o_c.shape[0]
        pad = n_chunks * ray_chunk - num_rays
        e_c = jnp.concatenate(
            [excl_ids, jnp.full((pad, k_e), -2, excl_ids.dtype)],
            axis=0).reshape(n_chunks, ray_chunk, k_e)
    else:
        e_c = None

    def body(_, args):
        if e_c is None:
            o, d = args
            return None, one_chunk(o, d, None)
        o, d, e = args
        return None, one_chunk(o, d, e)

    xs = (o_c, d_c) if e_c is None else (o_c, d_c, e_c)
    _, b_c = jax.lax.scan(body, None, xs)
    return b_c.reshape(-1)[:num_rays]



def _collect_blockers_accel(orig, dirs, accel, th_tri, e_a=None,
                            e_b=None, excl_ids=None, ray_chunk=8192,
                            group=16, k_max=32):
    """Blocker-slot collection through the cluster structure: the K
    nearest-t blocking triangles of each segment [orig, orig+dirs]
    (see em.py's blocker-slot note).  Only cheap SoA geometry runs in
    the per-cluster loop; the caller evaluates slab/Jones factors on
    the K slots once.

    A ray is exact when it entered at most ``k_max`` clusters; the
    remaining rays are re-collected by a dense all-cluster sweep
    under a scalar ``lax.cond``.  Cluster-id padding in the top-k
    table repeats id 0, so padded slots are masked to eid -1 by their
    +inf entry time (slot merging, unlike a boolean OR, is not
    idempotent)."""
    from .em import (empty_blocker_slots, blocker_candidates,
                     merge_blocker_slots)

    one = jnp.asarray(1., orig.dtype)
    csz = accel.cluster_size
    th_j = jnp.asarray(th_tri, jnp.float32)
    d_hat_all = dirs / jnp.maximum(
        jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-30)
    pol = e_a is not None

    def dense_collect(o, d, dh, ea, eb, excl, tri_chunk_clusters=128):
        n_c = accel.num_clusters
        r = o.shape[0]
        g = min(tri_chunk_clusters, n_c)
        n_steps = -(-n_c // g)
        cids = jnp.arange(n_steps * g, dtype=jnp.int32)
        wrap = cids >= n_c                      # mask re-visits
        cids = (cids % n_c).reshape(n_steps, g)
        wrap = wrap.reshape(n_steps, g)

        def body(slots, args):
            cid, w = args
            tri = accel.tri_c[cid].reshape(g * csz, 3, 3)
            eid = jnp.where(w[:, None], -1,
                            accel.old_id[cid]).reshape(g * csz)
            cand = blocker_candidates(o, d, dh, tri, None, eid,
                                      th_j, ea, eb, excl)
            return merge_blocker_slots(slots, cand), None

        init = empty_blocker_slots(r)
        slots, _ = jax.lax.scan(body, init, (cids, wrap))
        return slots

    def one_chunk(o, d, dh, ea, eb, excl):
        r = o.shape[0]
        t_entry = _slab_entry(o, d, accel.lo, accel.hi, one)
        ids, t_sort, n_steps, _, cnt = _top_clusters(
            t_entry, k_max, group)

        def body(slots, k):
            cid = jax.lax.dynamic_slice_in_dim(
                ids, k * group, group, axis=1)
            ts = jax.lax.dynamic_slice_in_dim(
                t_sort, k * group, group, axis=1)
            tri = accel.tri_c[cid].reshape(r, group * csz, 3, 3)
            eid = accel.old_id[cid].reshape(r, group * csz)
            # padded top-k slots (inf entry) must not contribute
            eid = jnp.where(
                jnp.repeat(jnp.isfinite(ts), csz, axis=1), eid, -1)
            cand = blocker_candidates(o, d, dh, tri, None, eid,
                                      th_j, ea, eb, excl)
            return merge_blocker_slots(slots, cand), None

        init = empty_blocker_slots(r)

        def process(_):
            slots, _ = jax.lax.scan(body, init, jnp.arange(n_steps))
            return slots

        slots = jax.lax.cond(jnp.any(cnt > 0), process,
                             lambda _: init, None)
        exact = cnt <= k_max

        def repair(_):
            d_s = dense_collect(o, d, dh, ea, eb, excl)
            return {key: jnp.where(exact[:, None], slots[key],
                                   d_s[key]) for key in slots}

        return jax.lax.cond(jnp.all(exact), lambda _: slots,
                            repair, None)

    num_rays = orig.shape[0]
    if num_rays <= ray_chunk:
        return one_chunk(orig, dirs, d_hat_all, e_a, e_b, excl_ids)
    o_c, d_c, _ = _ray_chunks(orig, dirs, ray_chunk)
    dh_c, _, _ = _ray_chunks(d_hat_all, dirs, ray_chunk)
    if pol:
        ea_c, _, _ = _ray_chunks(e_a, dirs, ray_chunk)
        eb_c, _, _ = _ray_chunks(e_b, dirs, ray_chunk)
    n_chunks = o_c.shape[0]
    if excl_ids is not None:
        k_e = excl_ids.shape[1]
        pad = n_chunks * ray_chunk - num_rays
        e_c = jnp.concatenate(
            [excl_ids, jnp.full((pad, k_e), -2, excl_ids.dtype)],
            axis=0).reshape(n_chunks, ray_chunk, k_e)
    else:
        e_c = None

    def body(_, args):
        o, d, dh = args[:3]
        rest = args[3:]
        ea, eb = (rest[0], rest[1]) if pol else (None, None)
        e = rest[-1] if e_c is not None else None
        return None, one_chunk(o, d, dh, ea, eb, e)

    xs = (o_c, d_c, dh_c)
    if pol:
        xs += (ea_c, eb_c)
    if e_c is not None:
        xs += (e_c,)
    _, s_c = jax.lax.scan(body, None, xs)
    return {key: v.reshape(-1, v.shape[-1])[:num_rays]
            for key, v in s_c.items()}


def transmission_product_accel(orig, dirs, accel, eta_tri, th_tri,
                               lam, excl_ids=None, ray_chunk=8192,
                               group=16, k_max=32):
    """Complex polarization-averaged slab-transmission product of
    each segment through EVERY blocking triangle, via the cluster
    structure (the ``refraction`` analog of
    :func:`any_blocking_hit_accel`).  The scalar product is
    commutative and needs no compaction, so every blocker's factor is
    accumulated directly per visited cluster group — exact (matches
    the dense :func:`em.transmission_product`); a ray that entered
    more than ``k_max`` clusters is re-solved by a dense all-cluster
    sweep under a scalar ``lax.cond``."""
    from .em import blocker_candidates, scalar_from_slots

    one = jnp.asarray(1., orig.dtype)
    csz = accel.cluster_size
    th_j = jnp.asarray(th_tri, jnp.float32)
    d_hat_all = dirs / jnp.maximum(
        jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-30)

    def group_prod(o, d, dh, tri, eid, excl):
        cand = blocker_candidates(o, d, dh, tri, None, eid, th_j,
                                  excl_ids=excl)
        return scalar_from_slots(cand, eta_tri, th_tri, lam)

    def dense_product(o, d, dh, excl, tri_chunk_clusters=128):
        n_c = accel.num_clusters
        r = o.shape[0]
        g = min(tri_chunk_clusters, n_c)
        n_steps = -(-n_c // g)
        cids = jnp.arange(n_steps * g, dtype=jnp.int32)
        wrap = cids >= n_c                      # mask re-visits
        cids = (cids % n_c).reshape(n_steps, g)
        wrap = wrap.reshape(n_steps, g)

        def body(prod, args):
            cid, w = args
            tri = accel.tri_c[cid].reshape(g * csz, 3, 3)
            eid = jnp.where(w[:, None], -1,
                            accel.old_id[cid]).reshape(g * csz)
            return prod * group_prod(o, d, dh, tri, eid, excl), None

        init = jnp.ones((r,), jnp.complex64)
        prod, _ = jax.lax.scan(body, init, (cids, wrap))
        return prod

    def one_chunk(o, d, dh, excl):
        r = o.shape[0]
        t_entry = _slab_entry(o, d, accel.lo, accel.hi, one)
        ids, t_sort, n_steps, _, cnt = _top_clusters(
            t_entry, k_max, group)

        def body(prod, k):
            cid = jax.lax.dynamic_slice_in_dim(
                ids, k * group, group, axis=1)
            ts = jax.lax.dynamic_slice_in_dim(
                t_sort, k * group, group, axis=1)
            tri = accel.tri_c[cid].reshape(r, group * csz, 3, 3)
            eid = accel.old_id[cid].reshape(r, group * csz)
            # padded top-k slots (inf entry) must not contribute
            eid = jnp.where(
                jnp.repeat(jnp.isfinite(ts), csz, axis=1), eid, -1)
            return prod * group_prod(o, d, dh, tri, eid, excl), None

        init = jnp.ones((r,), jnp.complex64)

        def process(_):
            prod, _ = jax.lax.scan(body, init, jnp.arange(n_steps))
            return prod

        prod = jax.lax.cond(jnp.any(cnt > 0), process,
                            lambda _: init, None)
        exact = cnt <= k_max

        def repair(_):
            d_p = dense_product(o, d, dh, excl)
            return jnp.where(exact, prod, d_p)

        return jax.lax.cond(jnp.all(exact), lambda _: prod,
                            repair, None)

    num_rays = orig.shape[0]
    if num_rays <= ray_chunk:
        return one_chunk(orig, dirs, d_hat_all, excl_ids)
    o_c, d_c, _ = _ray_chunks(orig, dirs, ray_chunk)
    dh_c, _, _ = _ray_chunks(d_hat_all, dirs, ray_chunk)
    n_chunks = o_c.shape[0]
    if excl_ids is not None:
        k_e = excl_ids.shape[1]
        pad = n_chunks * ray_chunk - num_rays
        e_c = jnp.concatenate(
            [excl_ids, jnp.full((pad, k_e), -2, excl_ids.dtype)],
            axis=0).reshape(n_chunks, ray_chunk, k_e)
    else:
        e_c = None

    def body(_, args):
        if e_c is None:
            o, d, dh = args
            return None, one_chunk(o, d, dh, None)
        o, d, dh, e = args
        return None, one_chunk(o, d, dh, e)

    xs = (o_c, d_c, dh_c) if e_c is None else (o_c, d_c, dh_c, e_c)
    _, p_c = jax.lax.scan(body, None, xs)
    return p_c.reshape(-1)[:num_rays]


def transmission_jones_product_accel(orig, dirs, accel, eta_tri,
                                     th_tri, lam, e_a, e_b,
                                     excl_ids=None, ray_chunk=8192,
                                     group=16, k_max=32):
    """Polarimetric analog of :func:`transmission_product_accel`:
    the ordered 2x2 Jones cascade of per-blocker TE/TM slab
    coefficients (see :func:`em.transmission_jones_product`) through
    the cluster structure.  e_a/e_b: [R, 3] transverse basis of each
    segment.  Returns [R, 2, 2] complex64.

    Slots are merged in ascending-t order, so the cascade applies
    factors in true along-ray crossing order regardless of cluster
    visit order.  Differences vs the dense
    :func:`em.transmission_jones_product`: (a) the dense sweep uses
    triangle-index order (commutator only in cross-pol terms,
    ~ -44 dB); (b) only the K = 16 nearest blockers contribute here —
    each dropped factor has |t| < 1, so truncation can only
    overestimate a path that 16+ walls have already pushed below
    -100 dB."""
    from .em import jones_from_slots
    slots = _collect_blockers_accel(
        orig, dirs, accel, th_tri, e_a=e_a, e_b=e_b,
        excl_ids=excl_ids, ray_chunk=ray_chunk, group=group,
        k_max=k_max)
    return jones_from_slots(slots, eta_tri, th_tri, lam)
