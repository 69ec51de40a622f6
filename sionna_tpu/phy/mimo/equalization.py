"""MIMO equalization functions (reference:
src/sionna/phy/mimo/equalization.py:11,101,235,345; fresh JAX
implementations).

All solvers are Cholesky-based (two triangular solves per RE) - the
batched [.., M, M] factorizations map straight onto the MXU.
"""

import jax
import jax.numpy as jnp

from ..config import config, dtypes
from ..utils.linalg import (matrix_pinv, batched_cholesky,
                            cholesky_solve)
from ..utils.tensors import expand_to_rank
from .utils import whiten_channel

__all__ = ["lmmse_matrix", "lmmse_equalizer", "zf_equalizer",
           "mf_equalizer"]


def _cdtype(precision):
    return config.cdtype if precision is None \
        else dtypes[precision]["jax"]["cdtype"]


def _cholesky_solve(chol, b):
    """Solves A x = b given chol(A) (lower); unrolled elementwise
    kernel for m <= 4 (see utils.linalg)."""
    return cholesky_solve(chol, b)


def lmmse_matrix(h, s=None, precision=None):
    """LMMSE equalization matrix G = H^H (H H^H + S)^{-1}
    (or the stable form (H^H H + I)^{-1} H^H for S = I)."""
    cdtype = _cdtype(precision)
    h = jnp.asarray(h, cdtype)
    if s is not None:
        s = jnp.asarray(s, cdtype)
        hhs = jnp.matmul(h, jnp.conjugate(jnp.swapaxes(h, -2, -1))) + s
        chol = batched_cholesky(hhs)
        g_t = _cholesky_solve(chol, h)
        return jnp.conjugate(jnp.swapaxes(g_t, -2, -1))
    eye = expand_to_rank(jnp.eye(h.shape[-1], dtype=cdtype), h.ndim, 0)
    hhs = jnp.matmul(jnp.conjugate(jnp.swapaxes(h, -2, -1)), h) + eye
    chol = batched_cholesky(hhs)
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


def lmmse_planes(y, h, s):
    """Plane-based LMMSE equalization (TPU layout: tiny matrix axes
    unrolled as Python lists, RE/batch axes stay in the arrays).

    Same algebra as :func:`lmmse_equalizer` with
    ``whiten_interference=True``: whiten by chol(S), then the stable
    form G = (H^H H + I)^{-1} H^H with the unbiased diag scaling.

    Parameters: y - list[m] of complex planes; h - list[m][k];
    s - list[m][m] (Hermitian). Returns (x_hat list[k] complex planes,
    no_eff list[k] real planes).
    """
    from ..utils.linalg import (plane_cholesky, plane_forward_solve,
                                plane_backward_solve_adj)
    m, k = len(h), len(h[0])
    chol_s = plane_cholesky(s)
    yw = plane_forward_solve(chol_s, [[y[i]] for i in range(m)])
    hw = plane_forward_solve(chol_s, h)

    one = jnp.ones_like(jnp.real(hw[0][0]))
    a = [[None] * k for _ in range(k)]
    for i in range(k):
        for j in range(i, k):
            acc = jnp.conjugate(hw[0][i]) * hw[0][j]
            for p in range(1, m):
                acc = acc + jnp.conjugate(hw[p][i]) * hw[p][j]
            if i == j:
                acc = acc + one.astype(acc.dtype)
            a[i][j] = acc
            if i != j:
                a[j][i] = jnp.conjugate(acc)
    chol_a = plane_cholesky(a)

    rhs = [[None] for _ in range(k)]
    for i in range(k):
        acc = jnp.conjugate(hw[0][i]) * yw[0][0]
        for p in range(1, m):
            acc = acc + jnp.conjugate(hw[p][i]) * yw[p][0]
        rhs[i][0] = acc
    z = plane_backward_solve_adj(chol_a,
                                 plane_forward_solve(chol_a, rhs))

    # diag(A^{-1}) via A X = I, column by column
    zero = jnp.zeros_like(a[0][0])
    eye_cols = [[zero if i != j else (one.astype(zero.dtype))
                 for j in range(k)] for i in range(k)]
    ainv = plane_backward_solve_adj(chol_a,
                                    plane_forward_solve(chol_a,
                                                        eye_cols))
    x_hat, no_eff = [], []
    for i in range(k):
        d = jnp.real(one - ainv[i][i])
        x_hat.append(z[i][0] / d.astype(z[i][0].dtype))
        no_eff.append(1 / d - 1)
    return x_hat, no_eff
