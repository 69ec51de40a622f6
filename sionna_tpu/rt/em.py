"""Electromagnetic (Jones/Fresnel) algebra for the RT solver:
single-interface Fresnel coefficients, ITU-R P.2040 slab transmission,
and the per-segment through-blocker transmission product.

Split out of solver.py so every interaction evaluator (specular,
diffraction, scattering, transmission) shares one implementation.
"""

import jax
import jax.numpy as jnp

from ..phy.constants import PI
from .geometry import moller_trumbore, tri_normals


def fresnel_coefficients(cos_i, eta):
    """Single-interface Fresnel reflection coefficients for incidence
    from vacuum onto a medium of complex relative permittivity
    ``eta``.

    cos_i: |cos| of the incidence angle (real, broadcastable to eta).
    Returns (r_te, r_tm) complex:

        r_te = (cos t - sqrt(eta - sin^2 t)) / (cos t + sqrt(...))
        r_tm = (eta cos t - sqrt(...)) / (eta cos t + sqrt(...))
    """
    sin2 = 1. - cos_i ** 2
    root = jnp.sqrt(eta - sin2)
    r_te = (cos_i - root) / (cos_i + root)
    r_tm = (eta * cos_i - root) / (eta * cos_i + root)
    return r_te, r_tm


def slab_transmission(cos_i, eta, d_th, lam):
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


# ----------------------------------------------------------------------
# Blocker-candidate machinery.  `blocker_candidates` computes, fully
# SoA, the per-(ray, triangle) geometry fields of a blocking crossing
# (hit parameter t, incidence cosine, TE-axis rotation (c, s), and
# original triangle id; non-blocking entries carry t = +inf /
# eid = -1).  Two consumers:
#
# * The DENSE sweep evaluates slab/Jones factors directly on the
#   candidate fields of each chunk, in triangle-index order — exact
#   per-ray t-sorting costs a top_k + 4 minor-dim gathers per ray,
#   measured at 5x the entire evaluation on TPU for small scenes,
#   and the ordering commutator lives only in cross-pol terms
#   (~ -44 dB; see transmission_jones_product).
#
# * The CLUSTERED path (accel.py) merges candidates into each
#   segment's K nearest-t blocker SLOTS via lax.top_k inside the
#   cluster loop, then runs the expensive complex slab
#   transcendentals + the ordered 2x2 Jones cascade on just those K
#   slots, in true along-ray crossing order.  With 1024 triangles
#   per visited group this cuts the transcendental/matrix work ~64x
#   and pays for the merge.
#
# A segment crossing more than K blockers keeps the K nearest; each
# dropped slab factor has |t| < 1, so the kept product only
# *overestimates* the magnitude of a path that K building walls have
# already attenuated to irrelevance (16 concrete walls ~ -100 dB).
# ----------------------------------------------------------------------

DEFAULT_K_BLOCKERS = 16


def empty_blocker_slots(num_rays, k_blockers=DEFAULT_K_BLOCKERS,
                        rdtype=jnp.float32):
    """Initial slot carry: no blockers."""
    return {
        "t": jnp.full((num_rays, k_blockers), jnp.inf, rdtype),
        "cos_i": jnp.zeros((num_rays, k_blockers), jnp.float32),
        "c": jnp.ones((num_rays, k_blockers), jnp.float32),
        "s": jnp.zeros((num_rays, k_blockers), jnp.float32),
        "eid": jnp.full((num_rays, k_blockers), -1, jnp.int32),
    }


def blocker_candidates(orig, dirs, d_hat, tri, n_tri, eid, th_tri,
                       e_a=None, e_b=None, excl_ids=None):
    """Per-(ray, triangle) blocker candidate fields for one triangle
    group.

    orig/dirs/d_hat: [R, 3]; tri: [R, C, 3, 3] or [C, 3, 3];
    n_tri: matching unit normals [..., C, 3], or None to compute them
    here (SoA, from the MT edge vectors); eid: [R, C] or [C]
    original triangle ids (-1 = padding); e_a/e_b: [R, 3] transverse
    basis (optional — only needed for the polarimetric cascade).
    Returns a slot-field dict of [R, C] arrays where non-blocking
    entries carry t = +inf / eid = -1.

    Fully SoA ([R, C] components, never [R, C, 3] vectors): a minor
    dim of 3 pads to 128 TPU lanes and costs a measured 6.5x (see
    geometry.moller_trumbore)."""
    if tri.ndim == 3:
        tri = tri[None]
        if n_tri is not None:
            n_tri = n_tri[None]
    if eid.ndim == 1:
        eid = eid[None]
    dx, dy, dz = (dirs[:, i:i + 1] for i in range(3))
    ox, oy, oz = (orig[:, i:i + 1] for i in range(3))
    v0x, v0y, v0z = (tri[..., 0, i] for i in range(3))
    e1x, e1y, e1z = (tri[..., 1, i] - tri[..., 0, i]
                     for i in range(3))
    e2x, e2y, e2z = (tri[..., 2, i] - tri[..., 0, i]
                     for i in range(3))
    # Moller-Trumbore (same tolerances as geometry.moller_trumbore)
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = px * e1x + py * e1y + pz * e1z
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1. / det, 0.)
    sx = ox - v0x
    sy = oy - v0y
    sz = oz - v0z
    u = (sx * px + sy * py + sz * pz) * inv_det
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = ((jnp.abs(det) > 1e-12) & (u >= -1e-9) & (v >= -1e-9)
           & (u + v <= 1. + 1e-9))
    b = hit & (eid >= 0) & (t > 1e-4) & (t < 1. - 1e-4)
    if excl_ids is not None:
        b &= ~jnp.any(eid[:, :, None] == excl_ids[:, None, :],
                      axis=-1)
    # zero-thickness materials transmit with factor exactly 1 —
    # never worth a slot
    safe = jnp.clip(eid, 0, th_tri.shape[0] - 1)
    b &= jnp.asarray(th_tri, jnp.float32)[safe] > 0.
    dhx, dhy, dhz = (d_hat[:, i:i + 1] for i in range(3))
    if n_tri is None:
        # unit normals from the MT edge vectors, SoA
        nx = e1y * e2z - e1z * e2y
        ny = e1z * e2x - e1x * e2z
        nz = e1x * e2y - e1y * e2x
        inv_len = 1. / jnp.maximum(
            jnp.sqrt(nx * nx + ny * ny + nz * nz), 1e-30)
        nx, ny, nz = nx * inv_len, ny * inv_len, nz * inv_len
    else:
        nx, ny, nz = (n_tri[..., i] for i in range(3))
    cos_i = jnp.abs(dhx * nx + dhy * ny + dhz * nz
                    ).astype(jnp.float32)
    if e_a is None:
        c = jnp.ones(b.shape, jnp.float32)
        s = jnp.zeros(b.shape, jnp.float32)
    else:
        # TE axis of each blocker within the (e_a, e_b) plane; at
        # normal incidence (|d x n| ~ 0) fall back to e_a — TE == TM
        # there so the angle is irrelevant and (c, s) = (1, 0).
        ex = dhy * nz - dhz * ny
        ey = dhz * nx - dhx * nz
        ez = dhx * ny - dhy * nx
        s_norm = jnp.sqrt(ex * ex + ey * ey + ez * ez)
        inv_n = 1. / jnp.maximum(s_norm, 1e-30)
        eax, eay, eaz = (e_a[:, i:i + 1] for i in range(3))
        ebx, eby, ebz = (e_b[:, i:i + 1] for i in range(3))
        small = s_norm <= 1e-6
        c = jnp.where(small, 1., (ex * eax + ey * eay + ez * eaz)
                      * inv_n).astype(jnp.float32)
        s = jnp.where(small, 0., (ex * ebx + ey * eby + ez * ebz)
                      * inv_n).astype(jnp.float32)
    return {
        "t": jnp.where(b, t, jnp.inf).astype(jnp.float32),
        "cos_i": cos_i,
        "c": c,
        "s": s,
        "eid": jnp.where(b, eid, -1).astype(jnp.int32),
    }


def sort_blocker_slots(cand, k_keep=DEFAULT_K_BLOCKERS):
    """Sorts candidate slot fields ascending in crossing parameter t
    (non-blockers carry t = +inf and sort last) with ONE fused
    variadic ``lax.sort`` — measured far cheaper than the top_k +
    per-field ``take_along_axis`` formulation that originally made
    exact ordering 5x the evaluation cost on TPU.

    Keeps only the ``k_keep`` nearest slots (the accel path's K —
    same truncation argument: each dropped slab factor has |t| < 1,
    so a path 16+ walls deep is only overestimated), which caps the
    downstream slab-transcendental work per segment."""
    t, cos_i, c, s, eid = jax.lax.sort(
        (cand["t"], cand["cos_i"], cand["c"], cand["s"],
         cand["eid"]), dimension=1, num_keys=1)
    if k_keep is not None and t.shape[1] > k_keep:
        t, cos_i, c, s, eid = (x[:, :k_keep]
                               for x in (t, cos_i, c, s, eid))
    return {"t": t, "cos_i": cos_i, "c": c, "s": s, "eid": eid}


def merge_blocker_slots(slots, cand):
    """Keeps the K smallest-t entries of slots ++ candidates,
    ascending in t (along-ray crossing order)."""
    k = slots["t"].shape[1]
    t_all = jnp.concatenate([slots["t"], cand["t"]], axis=1)
    neg, idx = jax.lax.top_k(-t_all, k)
    out = {"t": -neg}
    for key in ("cos_i", "c", "s", "eid"):
        merged = jnp.concatenate([slots[key], cand[key]], axis=1)
        out[key] = jnp.take_along_axis(merged, idx, axis=1)
    return out


def jones_from_slots(slots, eta_tri, th_tri, lam):
    """Ordered polarimetric transmission cascade of the collected
    blocker slots: [R, 2, 2] complex64.  Slots are ascending in t, so
    index 0 is crossed (and applied) first."""
    eid = slots["eid"]
    valid = eid >= 0
    safe = jnp.clip(eid, 0, jnp.asarray(eta_tri).shape[0] - 1)
    eta_j = jnp.asarray(eta_tri, jnp.complex64)
    th_j = jnp.asarray(th_tri, jnp.float32)
    t_te, t_tm = slab_transmission(
        slots["cos_i"], eta_j[safe], th_j[safe], lam)
    one_c = jnp.asarray(1. + 0j, jnp.complex64)
    zero_c = jnp.asarray(0. + 0j, jnp.complex64)
    t_te = jnp.where(valid, t_te, one_c)
    t_tm = jnp.where(valid, t_tm, one_c)
    c, s = slots["c"], slots["s"]
    cc = (c * c).astype(jnp.complex64)
    ss = (s * s).astype(jnp.complex64)
    cs = (c * s).astype(jnp.complex64)
    j00 = cc * t_te + ss * t_tm
    j01 = jnp.where(valid, cs * (t_te - t_tm), zero_c)
    j11 = ss * t_te + cc * t_tm
    c00, c01, c10, c11 = jones_tree_prod(j00, j01, j01, j11)
    return jnp.stack([jnp.stack([c00, c01], -1),
                      jnp.stack([c10, c11], -1)], -2)


def scalar_from_slots(slots, eta_tri, th_tri, lam):
    """Polarization-averaged transmission product of the collected
    blocker slots: [R] complex64 (commutative, order-free)."""
    eid = slots["eid"]
    valid = eid >= 0
    safe = jnp.clip(eid, 0, jnp.asarray(eta_tri).shape[0] - 1)
    eta_j = jnp.asarray(eta_tri, jnp.complex64)
    th_j = jnp.asarray(th_tri, jnp.float32)
    t_te, t_tm = slab_transmission(
        slots["cos_i"], eta_j[safe], th_j[safe], lam)
    one_c = jnp.asarray(1. + 0j, jnp.complex64)
    t_eff = jnp.where(valid, 0.5 * (t_te + t_tm), one_c)
    return jnp.prod(t_eff, axis=-1)


def _dense_chunks(orig, dirs, tri, max_elems):
    """Chunked triangle views for the dense sweep: (tri_c [n, C, 3, 3],
    n_c [n, C, 3], ids [n, C], d_hat [R, 3])."""
    num_rays = orig.shape[0]
    num_tri = tri.shape[0]
    chunk = num_tri if num_rays * num_tri <= max_elems \
        else max(64, max_elems // max(num_rays, 1))
    n_chunks = -(-num_tri // chunk)
    pad = n_chunks * chunk - num_tri
    tri_p = jnp.concatenate(
        [tri, jnp.zeros((pad, 3, 3), tri.dtype)], axis=0)
    tri_c = tri_p.reshape(n_chunks, chunk, 3, 3)
    n_p = jnp.concatenate(
        [tri_normals(tri), jnp.ones((pad, 3), tri.dtype)])
    n_c = n_p.reshape(n_chunks, chunk, 3)
    ids = jnp.concatenate(
        [jnp.arange(num_tri, dtype=jnp.int32),
         jnp.full((pad,), -1, jnp.int32)]).reshape(n_chunks, chunk)
    d_hat = dirs / jnp.maximum(
        jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-30)
    return tri_c, n_c, ids, d_hat


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
    from grazing for building materials.  For the full polarimetric
    cascade along a known path direction use
    :func:`transmission_jones_product`.  With ``accel``, the query
    runs through the clustered structure (see accel.py)."""
    if accel is not None:
        from .accel import transmission_product_accel
        return transmission_product_accel(
            orig, dirs, accel, eta_tri, th_tri, lam,
            excl_ids=excl_ids)
    tri_c, n_c, ids, d_hat = _dense_chunks(orig, dirs, tri, max_elems)

    def chunk_prod(tri_k, n_k, id_k):
        cand = blocker_candidates(
            orig, dirs, d_hat, tri_k, n_k, id_k, th_tri,
            excl_ids=excl_ids)
        return scalar_from_slots(cand, eta_tri, th_tri, lam)

    if tri_c.shape[0] == 1:
        return chunk_prod(tri_c[0], n_c[0], ids[0])

    def body(prod, args):
        return prod * chunk_prod(*args), None

    init = jnp.ones((orig.shape[0],), jnp.complex64)
    prod, _ = jax.lax.scan(body, init, (tri_c, n_c, ids))
    return prod


def jones_factor_components(b, t_te, t_tm, e_s_raw, e_a, e_b):
    """Components of the per-blocker transmission Jones factor in the
    caller's transverse basis, identity where ``b`` is False.

    e_s_raw: unnormalized TE axis (d x n) per blocker [R, C, 3];
    e_a/e_b: [R, 3].  Returns (j00, j01, j11) each [R, C] complex64
    (the factor is symmetric: j10 == j01)."""
    one_c = jnp.asarray(1. + 0j, jnp.complex64)
    zero_c = jnp.asarray(0. + 0j, jnp.complex64)
    t_te = jnp.where(b, t_te, one_c)
    t_tm = jnp.where(b, t_tm, one_c)
    s_norm = jnp.linalg.norm(e_s_raw, axis=-1, keepdims=True)
    e_s = jnp.where(s_norm > 1e-6,
                    e_s_raw / jnp.maximum(s_norm, 1e-30),
                    e_a[:, None, :])
    c = jnp.sum(e_s * e_a[:, None, :], -1)          # cos psi
    s = jnp.sum(e_s * e_b[:, None, :], -1)          # sin psi
    cc = (c * c).astype(jnp.complex64)
    ss = (s * s).astype(jnp.complex64)
    cs = (c * s).astype(jnp.complex64)
    j00 = cc * t_te + ss * t_tm
    j01 = cs * (t_te - t_tm)
    j11 = ss * t_te + cc * t_tm
    # non-blocking slots must be exactly identity (t_te == t_tm == 1
    # already gives that, but guard the off-diagonal against rounding)
    j01 = jnp.where(b, j01, zero_c)
    return j00, j01, j11


def jones_tree_prod(j00, j01, j10, j11):
    """Ordered matrix product over axis 1 of per-blocker 2x2 factors
    (index 0 applied FIRST, i.e. rightmost).  Matrix multiplication
    is associative, so a pairwise tree preserves the sequential
    result while vectorizing the reduction (log2 C levels instead of
    a C-step scan)."""
    while j00.shape[1] > 1:
        c = j00.shape[1]
        if c % 2:
            def pad(x, v):
                return jnp.concatenate(
                    [x, jnp.full_like(x[:, :1], v)], axis=1)
            j00 = pad(j00, 1.)
            j11 = pad(j11, 1.)
            j01 = pad(j01, 0.)
            j10 = pad(j10, 0.)
        a00, a01 = j00[:, 0::2], j01[:, 0::2]   # earlier (right)
        a10, a11 = j10[:, 0::2], j11[:, 0::2]
        b00, b01 = j00[:, 1::2], j01[:, 1::2]   # later (left)
        b10, b11 = j10[:, 1::2], j11[:, 1::2]
        j00 = b00 * a00 + b01 * a10
        j01 = b00 * a01 + b01 * a11
        j10 = b10 * a00 + b11 * a10
        j11 = b10 * a01 + b11 * a11
    return j00[:, 0], j01[:, 0], j10[:, 0], j11[:, 0]


def transmission_jones_product(orig, dirs, tri, eta_tri, th_tri, lam,
                               e_a, e_b, excl_ids=None,
                               max_elems=16_000_000, accel=None):
    """Full polarimetric through-blocker transmission: the 2x2 Jones
    matrix cascade of per-blocker TE/TM slab coefficients along the
    segment [orig, orig+dirs], expressed in the caller's transverse
    basis (e_a, e_b) of the propagation direction.

    Each blocker k rotates the field into its own incidence plane
    (TE axis e_s = d x n / |d x n|, TM axis e_p = e_s x d), applies
    diag(t_TE, t_TM), and rotates back:

        J = prod_k R(-psi_k) diag(t_TE_k, t_TM_k) R(psi_k)

    The propagation direction is unchanged by a slab crossing, so all
    factors act within the fixed (e_a, e_b) plane.  Factors of
    blockers with parallel normals commute exactly; for mixed normals
    the accumulation order affects only the (typically tiny)
    cross-polarization terms, matching upstream Sionna RT which
    applies per-blocker Jones factors as encountered.

    orig/dirs: [R, 3]; e_a/e_b: [R, 3] orthonormal transverse basis;
    Returns J: [R, 2, 2] complex64.

    Oblique TE/TM split matters for slanted walls: the
    polarization-averaged scalar of :func:`transmission_product` is
    exact only at normal incidence.

    Ordering: both paths apply factors in true along-ray crossing
    order.  The dense sweep sorts its candidate slots ascending in t
    with one fused variadic ``lax.sort`` (round 5 — the previous
    index-order approximation measured up to -28 dB commutator error
    on adversarial tilted-slab stacks, vs the -44 dB one-scene
    anecdote it was bounded by); the accel path (large scenes) has
    crossing order by construction via its K-nearest-blocker slots.
    For the rare multi-chunk dense case (no accel and > 16M
    ray-triangle pairs) ordering is exact within each chunk and
    chunk-major across chunks.  With ``accel``, the query runs
    through the clustered structure (see accel.py)."""
    if accel is not None:
        from .accel import transmission_jones_product_accel
        return transmission_jones_product_accel(
            orig, dirs, accel, eta_tri, th_tri, lam, e_a, e_b,
            excl_ids=excl_ids)
    tri_c, n_c, ids, d_hat = _dense_chunks(orig, dirs, tri, max_elems)

    def chunk_jones(tri_k, n_k, id_k):
        cand = blocker_candidates(
            orig, dirs, d_hat, tri_k, n_k, id_k, th_tri,
            e_a, e_b, excl_ids)
        # exact along-ray crossing order (one fused variadic sort):
        # the commutator of index-order factors lives in the
        # cross-polarization terms and measured up to -28 dB on
        # adversarial tilted-slab stacks — too large against the
        # 0.1 dB parity budget to keep as an approximation
        return jones_from_slots(sort_blocker_slots(cand), eta_tri,
                                th_tri, lam)

    if tri_c.shape[0] == 1:
        return chunk_jones(tri_c[0], n_c[0], ids[0])

    def body(jones, args):
        c = chunk_jones(*args)                       # [R, 2, 2]
        return c @ jones, None

    init = jnp.broadcast_to(jnp.eye(2, dtype=jnp.complex64),
                            (orig.shape[0], 2, 2))
    jones, _ = jax.lax.scan(body, init, (tri_c, n_c, ids))
    return jones
