"""Spatial correlation models (reference:
src/sionna/phy/channel/spatial_correlation.py:12,42,124)."""

import numpy as np

import jax.numpy as jnp

from ..block import Object

__all__ = ["SpatialCorrelation", "KroneckerModel", "PerColumnModel"]


class SpatialCorrelation(Object):
    """Abstract spatial correlation applied to [..., M, K] channels."""

    def __call__(self, h, *args, **kwargs):
        raise NotImplementedError


class KroneckerModel(SpatialCorrelation):
    """Kronecker correlation: h <- R_rx^{1/2} h (R_tx^{1/2})^T
    (reference spatial_correlation.py:42; argument order (r_tx, r_rx)
    matches the reference's __init__ at :86)."""

    def __init__(self, r_tx=None, r_rx=None):
        super().__init__()
        self.r_rx = r_rx
        self.r_tx = r_tx

    @property
    def r_rx(self):
        return self._r_rx

    @r_rx.setter
    def r_rx(self, value):
        self._r_rx = None if value is None else np.asarray(value)
        self._r_rx_sqrt = None if value is None \
            else _matrix_sqrt(self._r_rx)

    @property
    def r_tx(self):
        return self._r_tx

    @r_tx.setter
    def r_tx(self, value):
        self._r_tx = None if value is None else np.asarray(value)
        self._r_tx_sqrt = None if value is None \
            else _matrix_sqrt(self._r_tx)

    def __call__(self, h):
        h = jnp.asarray(h)
        if self._r_rx_sqrt is not None:
            h = jnp.matmul(jnp.asarray(self._r_rx_sqrt, h.dtype), h)
        if self._r_tx_sqrt is not None:
            h = jnp.matmul(h, jnp.swapaxes(
                jnp.asarray(self._r_tx_sqrt, h.dtype), -2, -1))
        return h


class PerColumnModel(SpatialCorrelation):
    """Per-column receive correlation: each column k of h gets its own
    R_rx^{1/2} (reference spatial_correlation.py:124)."""

    def __init__(self, r_rx):
        super().__init__()
        self.r_rx = r_rx

    @property
    def r_rx(self):
        return self._r_rx

    @r_rx.setter
    def r_rx(self, value):
        self._r_rx = np.asarray(value)  # [..., K, M, M]
        self._r_rx_sqrt = _matrix_sqrt(self._r_rx)

    def __call__(self, h):
        h = jnp.asarray(h)
        # h: [..., M, K]; apply per-column matrices
        hc = jnp.swapaxes(h, -2, -1)[..., None]  # [..., K, M, 1]
        hc = jnp.matmul(jnp.asarray(self._r_rx_sqrt, h.dtype), hc)
        return jnp.swapaxes(hc[..., 0], -2, -1)


def _matrix_sqrt(r):
    """Hermitian PSD matrix square root via eigendecomposition
    (host-side NumPy; correlation matrices are static config)."""
    r = np.asarray(r)
    w, v = np.linalg.eigh(r)
    w = np.maximum(w, 0)
    sqrt_w = np.sqrt(w).astype(r.dtype)
    return np.matmul(v * sqrt_w[..., None, :],
                     np.conj(np.swapaxes(v, -2, -1)))
