"""Single-bounce diffuse scattering for the TPU path solver
(effective-roughness model, Degli-Esposti): host-side area-weighted
surface sampling plus one fused device evaluation of the bistatic
scattered field with per-material re-radiation lobes
(see rt/scattering_pattern.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from ..phy.constants import PI, SPEED_OF_LIGHT
from .field import combine_paths
from .geometry import any_blocking_hit, phase_exp

__all__ = ["sample_scatter_points", "eval_scattering"]


def sample_scatter_points(scene, scat_tri, num_samples, seed, rd):
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


def eval_scattering(scene, tri, normals, tx_pos, rx_pos, eta_tri, p,
                    tri_idx, d_area, num_samples, seed, txs, rxs,
                    th_tri=None, refraction=False, accel=None):
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
           * jnp.exp(1j * chi0) * phase_exp(total_len, lam))
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
    o2 = jnp.broadcast_to(
        p[:, None, None],
        (num_samples, num_tx, num_rx, 3)).reshape(-1, 3)
    d2 = jnp.broadcast_to(
        s2_vec, (num_samples, num_tx, num_rx, 3)).reshape(-1, 3)
    if refraction:
        # Full polarimetric through-blocker cascade (same as the
        # specular and diffraction stages): segment-1 factors in the
        # spherical basis of the departure direction shat1, segment-2
        # factors in the arrival basis of u_r = -shat2 — the bases
        # combine_paths contracts the Jones matrix with.
        from .em import transmission_jones_product
        from .geometry import sph_basis
        shape3 = (num_samples, num_tx, num_rx, 3)
        e_th1, e_ph1 = sph_basis(shat1)             # [N,T,3]
        ea1 = jnp.broadcast_to(e_th1[:, :, None], shape3
                               ).reshape(-1, 3)
        eb1 = jnp.broadcast_to(e_ph1[:, :, None], shape3
                               ).reshape(-1, 3)
        e_th2, e_ph2 = sph_basis(-shat2)            # [N,1,R,3]
        ea2 = jnp.broadcast_to(e_th2, shape3).reshape(-1, 3)
        eb2 = jnp.broadcast_to(e_ph2, shape3).reshape(-1, 3)
        jt1 = transmission_jones_product(
            o1, -d1, tri, eta_tri, th_tri, lam, ea1, eb1,
            excl_ids=excl_b, accel=accel)
        jt2 = transmission_jones_product(
            o2, d2, tri, eta_tri, th_tri, lam, ea2, eb2,
            excl_ids=excl_b, accel=accel)
        jones = (jt2.reshape(num_samples, num_tx, num_rx, 2, 2)
                 @ jones
                 @ jt1.reshape(num_samples, num_tx, num_rx, 2, 2))
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
    return combine_paths(scene, txs, rxs, d0_hat, u_r, jones, amp,
                         valid, tau)
