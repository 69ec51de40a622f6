"""Linear-algebra helpers (API parity with reference
src/sionna/phy/utils/linalg.py:8-34; fresh JAX implementations).

TPU design note: batched Cholesky/triangular solves on tiny matrices
(the per-resource-element MIMO systems, m <= 4) are unrolled into
elementwise VPU arithmetic - XLA's generic batched factorizations
lower to sequential loops that run orders of magnitude slower at
per-RE batch sizes.  Above ``_SMALL_M`` the jnp.linalg kernels are
used unchanged.
"""

import jax
import jax.numpy as jnp

# Largest trailing dimension handled by the unrolled kernels.
_SMALL_M = 4


def _stack_rows(rows):
    """[[...m entries...] x m] -> [..., m, m]."""
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def small_cholesky(a):
    """Unrolled Cholesky factor L (lower) of [..., m, m] Hermitian PD
    matrices for m <= 4; elementwise over all batch dims."""
    m = a.shape[-1]
    zero = jnp.zeros_like(a[..., 0, 0])
    l = [[zero] * m for _ in range(m)]
    for j in range(m):
        s = a[..., j, j]
        for p in range(j):
            s = s - l[j][p] * jnp.conjugate(l[j][p])
        ljj = jnp.sqrt(jnp.real(s)).astype(a.dtype)
        l[j][j] = ljj
        for i in range(j + 1, m):
            v = a[..., i, j]
            for p in range(j):
                v = v - l[i][p] * jnp.conjugate(l[j][p])
            l[i][j] = v / ljj
    return _stack_rows(l)


def _small_solve_lower(l, b):
    """Solves L y = b for lower-triangular [..., m, m] L and
    [..., m, k] b, unrolled over m."""
    m = l.shape[-1]
    y = [None] * m
    for i in range(m):
        v = b[..., i, :]
        for p in range(i):
            v = v - l[..., i, p, None] * y[p]
        y[i] = v / l[..., i, i, None]
    return jnp.stack(y, axis=-2)


def _small_solve_upper_adj(l, b):
    """Solves L^H x = b (L lower-triangular), unrolled over m."""
    m = l.shape[-1]
    x = [None] * m
    for i in range(m - 1, -1, -1):
        v = b[..., i, :]
        for p in range(i + 1, m):
            v = v - jnp.conjugate(l[..., p, i, None]) * x[p]
        x[i] = v / jnp.conjugate(l[..., i, i, None])
    return jnp.stack(x, axis=-2)


def batched_cholesky(a):
    """Cholesky factor of [..., m, m] Hermitian PD matrices; unrolled
    elementwise kernel for m <= 4, jnp.linalg.cholesky above."""
    if a.shape[-1] <= _SMALL_M:
        return small_cholesky(a)
    return jnp.linalg.cholesky(a)


def solve_triangular_lower(l, b):
    """Solves L y = b with L lower-triangular, [..., m, k] RHS."""
    if l.shape[-1] <= _SMALL_M:
        return _small_solve_lower(l, b)
    return jax.scipy.linalg.solve_triangular(l, b, lower=True)


def cholesky_solve(chol, b):
    """Solves A x = b given the lower Cholesky factor of A."""
    if chol.shape[-1] <= _SMALL_M:
        return _small_solve_upper_adj(chol, _small_solve_lower(chol, b))
    y = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.conjugate(jnp.swapaxes(chol, -2, -1)), y, lower=False)


def inv_cholesky(tensor):
    """Inverse ``L^{-1}`` of the Cholesky factor of a batch of Hermitian
    positive-definite matrices: returns ``L^{-1}`` with
    ``tensor = L L^H``."""
    tensor = jnp.asarray(tensor)
    l = batched_cholesky(tensor)
    eye = jnp.eye(tensor.shape[-1], dtype=tensor.dtype)
    eye = jnp.broadcast_to(eye, l.shape)
    return solve_triangular_lower(l, eye)


def matrix_pinv(tensor):
    """Moore-Penrose pseudo-inverse ``(A^H A)^{-1} A^H`` for a batch of
    full-column-rank matrices, computed via Cholesky of the Gram
    matrix (TPU-friendly: two triangular solves instead of SVD)."""
    tensor = jnp.asarray(tensor)
    gram = jnp.matmul(jnp.conjugate(jnp.swapaxes(tensor, -2, -1)), tensor)
    l_inv = inv_cholesky(gram)
    gram_inv = jnp.matmul(jnp.conjugate(jnp.swapaxes(l_inv, -2, -1)), l_inv)
    return jnp.matmul(gram_inv,
                      jnp.conjugate(jnp.swapaxes(tensor, -2, -1)))


# ---------------------------------------------------------------------
# Plane-based small-matrix kernels.
#
# For per-resource-element MIMO math the natural TPU layout keeps the
# (large) batch/grid axes minor and unrolls the (tiny) matrix axes
# into Python lists of "planes": M[i][j] is an array holding element
# (i, j) of every RE's matrix.  All kernels below are static Python
# loops emitting elementwise VPU ops - no [..., m, m] tensors with
# 1-128 lane padding waste ever materialize.
# ---------------------------------------------------------------------

def plane_cholesky(a):
    """Cholesky of Hermitian PD matrices given as planes a[i][j]
    (only j <= i read); returns lower-triangular planes l[i][j]."""
    m = len(a)
    l = [[None] * m for _ in range(m)]
    for j in range(m):
        s = a[j][j]
        for p in range(j):
            s = s - l[j][p] * jnp.conjugate(l[j][p])
        ljj = jnp.sqrt(jnp.real(s)).astype(a[j][j].dtype)
        l[j][j] = ljj
        for i in range(j + 1, m):
            v = a[i][j]
            for p in range(j):
                v = v - l[i][p] * jnp.conjugate(l[j][p])
            l[i][j] = v / ljj
    return l


def plane_forward_solve(l, b):
    """Solves L Y = B; B is a list (rows) of lists (cols) of planes."""
    m = len(l)
    k = len(b[0])
    y = [[None] * k for _ in range(m)]
    for i in range(m):
        for c in range(k):
            v = b[i][c]
            for p in range(i):
                v = v - l[i][p] * y[p][c]
            y[i][c] = v / l[i][i]
    return y


def plane_backward_solve_adj(l, b):
    """Solves L^H X = B with L lower-triangular planes."""
    m = len(l)
    k = len(b[0])
    x = [[None] * k for _ in range(m)]
    for i in range(m - 1, -1, -1):
        for c in range(k):
            v = b[i][c]
            for p in range(i + 1, m):
                v = v - jnp.conjugate(l[p][i]) * x[p][c]
            x[i][c] = v / jnp.conjugate(l[i][i])
    return x
