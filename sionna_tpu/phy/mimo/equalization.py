"""MIMO equalization functions (reference:
src/sionna/phy/mimo/equalization.py:11,101,235,345; fresh JAX
implementations).

All solvers are Cholesky-based (two triangular solves per RE) - the
batched [.., M, M] factorizations map straight onto the MXU.
"""

import jax
import jax.numpy as jnp

from ..config import config, dtypes
from ..utils.linalg import matrix_pinv
from ..utils.tensors import expand_to_rank
from .utils import whiten_channel

__all__ = ["lmmse_matrix", "lmmse_equalizer", "zf_equalizer",
           "mf_equalizer"]


def _cdtype(precision):
    return config.cdtype if precision is None \
        else dtypes[precision]["jax"]["cdtype"]


def _cholesky_solve(chol, b):
    """Solves A x = b given chol(A) (lower)."""
    y = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.conjugate(jnp.swapaxes(chol, -2, -1)), y, lower=False)


def lmmse_matrix(h, s=None, precision=None):
    """LMMSE equalization matrix G = H^H (H H^H + S)^{-1}
    (or the stable form (H^H H + I)^{-1} H^H for S = I)."""
    cdtype = _cdtype(precision)
    h = jnp.asarray(h, cdtype)
    if s is not None:
        s = jnp.asarray(s, cdtype)
        hhs = jnp.matmul(h, jnp.conjugate(jnp.swapaxes(h, -2, -1))) + s
        chol = jnp.linalg.cholesky(hhs)
        g_t = _cholesky_solve(chol, h)
        return jnp.conjugate(jnp.swapaxes(g_t, -2, -1))
    eye = expand_to_rank(jnp.eye(h.shape[-1], dtype=cdtype), h.ndim, 0)
    hhs = jnp.matmul(jnp.conjugate(jnp.swapaxes(h, -2, -1)), h) + eye
    chol = jnp.linalg.cholesky(hhs)
    return _cholesky_solve(chol, jnp.conjugate(jnp.swapaxes(h, -2, -1)))


def lmmse_equalizer(y, h, s, whiten_interference=True, precision=None):
    """LMMSE equalization: returns (x_hat, no_eff) with the unbiased
    diag(GH)^{-1} scaling (reference equalization.py:101)."""
    cdtype = _cdtype(precision)
    y = jnp.asarray(y, cdtype)
    h = jnp.asarray(h, cdtype)
    s = jnp.asarray(s, cdtype)

    if not whiten_interference:
        g = lmmse_matrix(h, s, precision=precision)
    else:
        y, h = whiten_channel(y, h, s, return_s=False)
        g = lmmse_matrix(h, s=None, precision=precision)

    gh = jnp.matmul(g, h)
    d = jnp.diagonal(gh, axis1=-2, axis2=-1)
    gy = jnp.matmul(g, y[..., None])[..., 0]
    x_hat = gy / d
    one = jnp.asarray(1, cdtype)
    no_eff = jnp.real(one / d - one)
    return x_hat, no_eff


def zf_equalizer(y, h, s, precision=None):
    """Zero-forcing equalization: G = (H^H H)^{-1} H^H
    (reference equalization.py:235)."""
    cdtype = _cdtype(precision)
    y = jnp.asarray(y, cdtype)
    h = jnp.asarray(h, cdtype)
    s = jnp.asarray(s, cdtype)
    g = matrix_pinv(h)
    x_hat = jnp.matmul(g, y[..., None])[..., 0]
    gsg = jnp.matmul(jnp.matmul(g, s),
                     jnp.conjugate(jnp.swapaxes(g, -2, -1)))
    no_eff = jnp.real(jnp.diagonal(gsg, axis1=-2, axis2=-1))
    return x_hat, no_eff


def mf_equalizer(y, h, s, precision=None):
    """Matched filter equalization: G = diag(H^H H)^{-1} H^H
    (reference equalization.py:345)."""
    cdtype = _cdtype(precision)
    y = jnp.asarray(y, cdtype)
    h = jnp.asarray(h, cdtype)
    s = jnp.asarray(s, cdtype)
    hth = jnp.matmul(jnp.conjugate(jnp.swapaxes(h, -2, -1)), h)
    d_inv = 1 / jnp.diagonal(hth, axis1=-2, axis2=-1)
    g = d_inv[..., None] * jnp.conjugate(jnp.swapaxes(h, -2, -1))
    x_hat = jnp.matmul(g, y[..., None])[..., 0]
    gsg = jnp.matmul(jnp.matmul(g, s),
                     jnp.conjugate(jnp.swapaxes(g, -2, -1)))
    gh = jnp.matmul(g, h)
    eye = expand_to_rank(jnp.eye(h.shape[-1], dtype=cdtype), h.ndim, 0)
    err = eye - gh
    err_cov = jnp.matmul(err, jnp.conjugate(jnp.swapaxes(err, -2, -1)))
    no_eff = jnp.abs(jnp.diagonal(err_cov + gsg, axis1=-2, axis2=-1))
    return x_hat, no_eff
