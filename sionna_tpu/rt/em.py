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
        [tri_normals(tri), jnp.ones((pad, 3), tri.dtype)])
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
        t_te, t_tm = slab_transmission(
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
                               max_elems=16_000_000):
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
    exact only at normal incidence."""
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
        [jnp.asarray(th_tri, jnp.float32),
         jnp.zeros((pad,), jnp.float32)])
    th_c = th_p.reshape(n_chunks, chunk)
    n_p = jnp.concatenate(
        [tri_normals(tri), jnp.ones((pad, 3), tri.dtype)])
    n_c = n_p.reshape(n_chunks, chunk, 3)
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    d_hat = dirs / jnp.maximum(
        jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-30)

    def body(jones, args):
        tri_chunk, eta_k, th_k, n_k, base = args
        t, hit = moller_trumbore(orig, dirs, tri_chunk)
        b = hit & (t > 1e-4) & (t < 1. - 1e-4)       # [R, C]
        if excl_ids is not None:
            gid = base + jnp.arange(tri_chunk.shape[0],
                                    dtype=jnp.int32)
            b &= ~jnp.any(
                gid[None, None, :] == excl_ids[:, :, None], axis=1)
        cos_i = jnp.abs(jnp.sum(d_hat[:, None, :] * n_k[None],
                                axis=-1))            # [R, C]
        t_te, t_tm = slab_transmission(
            cos_i.astype(jnp.float32), eta_k[None], th_k[None], lam)
        # TE axis of each blocker in the (e_a, e_b) plane:
        # e_s = d x n; at normal incidence fall back to e_a (TE == TM
        # there so the angle is irrelevant).
        # R(psi) J0 R(-psi) with J0 = diag(t_te, t_tm):
        # [[c^2 te + s^2 tm, c s (te - tm)],
        #  [c s (te - tm),   s^2 te + c^2 tm]]
        e_s_raw = jnp.cross(d_hat[:, None, :], n_k[None])  # [R, C, 3]
        j00, j01, j11 = jones_factor_components(
            b, t_te, t_tm, e_s_raw, e_a, e_b)
        c00, c01, c10, c11 = jones_tree_prod(j00, j01, j01, j11)
        a = jones
        n00 = c00 * a[:, 0, 0] + c01 * a[:, 1, 0]
        n01 = c00 * a[:, 0, 1] + c01 * a[:, 1, 1]
        n10 = c10 * a[:, 0, 0] + c11 * a[:, 1, 0]
        n11 = c10 * a[:, 0, 1] + c11 * a[:, 1, 1]
        jones = jnp.stack([jnp.stack([n00, n01], -1),
                           jnp.stack([n10, n11], -1)], -2)
        return jones, None

    init = jnp.broadcast_to(
        jnp.eye(2, dtype=jnp.complex64), (num_rays, 2, 2))
    jones, _ = jax.lax.scan(
        body, init, (tri_c, eta_c, th_c, n_c, bases))
    return jones
