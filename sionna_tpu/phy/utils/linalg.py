"""Linear-algebra helpers (API parity with reference
src/sionna/phy/utils/linalg.py:8-34; fresh JAX implementations)."""

import jax.numpy as jnp


def inv_cholesky(tensor):
    """Inverse ``L^{-1}`` of the Cholesky factor of a batch of Hermitian
    positive-definite matrices: returns ``L^{-1}`` with
    ``tensor = L L^H``."""
    tensor = jnp.asarray(tensor)
    l = jnp.linalg.cholesky(tensor)
    eye = jnp.eye(tensor.shape[-1], dtype=tensor.dtype)
    eye = jnp.broadcast_to(eye, l.shape)
    import jax
    return jax.scipy.linalg.solve_triangular(l, eye, lower=True)


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
