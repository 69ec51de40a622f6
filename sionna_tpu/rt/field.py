"""Field combination stage shared by all RT interaction evaluators:
applies antenna patterns in device-local frames, synthetic-array
phase offsets, and per-path Doppler to Jones matrices, producing the
Paths-layout output dict."""

import numpy as np

import jax.numpy as jnp

from ..phy.constants import PI, SPEED_OF_LIGHT
from .geometry import rot_matrix, sph_basis, unit_to_angles

__all__ = ["combine_paths"]


def combine_paths(scene, txs, rxs, d0_hat, u_r, jones, amp, valid,
                  tau):
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
    theta_t_g, phi_t_g = unit_to_angles(d0_hat)
    theta_r_g, phi_r_g = unit_to_angles(u_r)

    rot_tx = np.stack([rot_matrix(t.orientation) for t in txs])
    rot_rx = np.stack([rot_matrix(r.orientation) for r in rxs])
    d0_loc = jnp.einsum("tij,stri->strj",
                        jnp.asarray(rot_tx), d0_hat)
    ur_loc = jnp.einsum("rij,stri->strj",
                        jnp.asarray(rot_rx), u_r)
    th_t_l, ph_t_l = unit_to_angles(d0_loc)
    th_r_l, ph_r_l = unit_to_angles(ur_loc)

    # F: ([S,tx,rx,ant] theta-comp, phi-comp)
    f_t_th, f_t_ph = scene.tx_array.field(th_t_l, ph_t_l)
    f_r_th, f_r_ph = scene.rx_array.field(th_r_l, ph_r_l)
    # Rotate local pattern components to the global basis: the
    # local spherical basis maps to the global one via the angle
    # between bases; compute via basis vectors
    e_th_t_l, e_ph_t_l = sph_basis(d0_loc)
    e_th_t_g, e_ph_t_g = sph_basis(d0_hat)
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

    e_th_r_l, e_ph_r_l = sph_basis(ur_loc)
    e_th_r_g, e_ph_r_g = sph_basis(u_r)
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
