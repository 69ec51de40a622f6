"""MIMO precoding functions (reference:
src/sionna/phy/mimo/precoding.py:12,91,157,247,307,394,426; fresh JAX
implementations)."""

import numpy as np

import jax
import jax.numpy as jnp

from ..config import config, dtypes
from ..constants import PI
from ..utils.tensors import expand_to_rank

__all__ = ["rzf_precoding_matrix", "cbf_precoding_matrix",
           "rzf_precoder", "grid_of_beams_dft_ula", "grid_of_beams_dft",
           "flatten_precoding_mat", "normalize_precoding_power"]


def _cdtype(precision):
    return config.cdtype if precision is None \
        else dtypes[precision]["jax"]["cdtype"]


def rzf_precoding_matrix(h, alpha=0., precision=None):
    """Regularized zero-forcing precoder
    G = H^H (H H^H + alpha I)^{-1}, columns normalized to unit power.
    h: [..., K, M] (K users, M tx antennas) -> g: [..., M, K]."""
    cdtype = _cdtype(precision)
    h = jnp.asarray(h, cdtype)
    alpha = jnp.asarray(alpha, cdtype)
    g = jnp.matmul(h, jnp.conjugate(jnp.swapaxes(h, -2, -1)))
    alpha = expand_to_rank(alpha, g.ndim, axis=-1)
    eye = jnp.broadcast_to(jnp.eye(g.shape[-1], dtype=cdtype), g.shape)
    g = g + alpha * eye
    chol = jnp.linalg.cholesky(g)
    g = jax.scipy.linalg.cho_solve((chol, True), h)
    g = jnp.conjugate(jnp.swapaxes(g, -2, -1))  # [..., M, K]
    norm = jnp.sqrt(jnp.sum(jnp.abs(g) ** 2, axis=-2, keepdims=True))
    return jnp.where(norm == 0, jnp.zeros_like(g),
                     g / norm.astype(cdtype))


def cbf_precoding_matrix(h, precision=None):
    """Conjugate (matched-filter) beamforming precoder G = H^H with
    unit-power columns (reference precoding.py:91)."""
    cdtype = _cdtype(precision)
    h = jnp.asarray(h, cdtype)
    g = jnp.conjugate(jnp.swapaxes(h, -2, -1))
    norm = jnp.sqrt(jnp.sum(jnp.abs(g) ** 2, axis=-2, keepdims=True))
    return jnp.where(norm == 0, jnp.zeros_like(g),
                     g / norm.astype(cdtype))


def rzf_precoder(x, h, alpha=0., return_precoding_matrices=False,
                 precision=None):
    """Applies RZF precoding to symbol vectors
    (reference precoding.py:157)."""
    cdtype = _cdtype(precision)
    x = jnp.asarray(x, cdtype)
    h = jnp.asarray(h, cdtype)
    g = rzf_precoding_matrix(h, alpha=alpha, precision=precision)
    x_precoded = jnp.matmul(g, x[..., None])[..., 0]
    if return_precoding_matrices:
        return x_precoded, g
    return x_precoded


def grid_of_beams_dft_ula(num_ant, oversmpl=1, precision=None):
    """DFT grid-of-beams vectors for a ULA
    (reference precoding.py:247). Returns
    [num_ant * oversmpl, num_ant]."""
    cdtype = _cdtype(precision)
    num_beams = num_ant * oversmpl
    m = np.arange(num_beams)[:, None]
    n = np.arange(num_ant)[None, :]
    gob = np.exp(2j * PI * n * m / num_beams) / np.sqrt(num_ant)
    return jnp.asarray(gob, cdtype)


def grid_of_beams_dft(num_ant_v, num_ant_h, oversmpl_v=1, oversmpl_h=1,
                      precision=None):
    """2D DFT grid of beams via Kronecker product of vertical and
    horizontal ULA codebooks (reference precoding.py:307). Returns
    [num_beams_v, num_beams_h, num_ant_v * num_ant_h]."""
    gob_v = np.asarray(grid_of_beams_dft_ula(num_ant_v, oversmpl_v,
                                             precision))
    gob_h = np.asarray(grid_of_beams_dft_ula(num_ant_h, oversmpl_h,
                                             precision))
    kron = gob_v[:, None, :, None] * gob_h[None, :, None, :]
    kron = kron.reshape(gob_v.shape[0], gob_h.shape[0], -1)
    return jnp.asarray(kron, _cdtype(precision))


def flatten_precoding_mat(precoding_mat, by_column=True):
    """Flattens the last two dims of a precoding matrix
    (reference precoding.py:394)."""
    precoding_mat = jnp.asarray(precoding_mat)
    if by_column:
        precoding_mat = jnp.swapaxes(precoding_mat, -2, -1)
    return jnp.reshape(precoding_mat, precoding_mat.shape[:-2] + (-1,))


def normalize_precoding_power(precoding_vec, tx_power_list=None,
                              precision=None):
    """Normalizes precoding vectors to the given power
    (reference precoding.py:426)."""
    cdtype = _cdtype(precision)
    precoding_vec = jnp.asarray(precoding_vec, cdtype)
    norm = jnp.sqrt(jnp.sum(jnp.abs(precoding_vec) ** 2, axis=-1,
                            keepdims=True))
    vec = jnp.where(norm == 0, jnp.zeros_like(precoding_vec),
                    precoding_vec / norm.astype(cdtype))
    if tx_power_list is not None:
        power = jnp.asarray(tx_power_list)
        vec = vec * jnp.sqrt(power)[..., None].astype(cdtype)
    return vec
