"""MIMO utilities: complex<->real transforms, channel whitening, and
candidate-list-to-LLR (reference: src/sionna/phy/mimo/utils.py:11-292,
358,420; fresh JAX implementations)."""

import numpy as np

import jax
import jax.numpy as jnp

from ..block import Block
from ..utils.linalg import inv_cholesky

__all__ = ["complex2real_vector", "real2complex_vector",
           "complex2real_matrix", "real2complex_matrix",
           "complex2real_covariance", "real2complex_covariance",
           "complex2real_channel", "real2complex_channel",
           "whiten_channel", "List2LLR", "List2LLRSimple"]


def complex2real_vector(z):
    """[..., M] complex -> [..., 2M] real: [Re(z); Im(z)]."""
    z = jnp.asarray(z)
    return jnp.concatenate([jnp.real(z), jnp.imag(z)], axis=-1)


def real2complex_vector(z):
    """[..., 2M] real -> [..., M] complex."""
    z = jnp.asarray(z)
    m = z.shape[-1] // 2
    return z[..., :m] + 1j * z[..., m:]


def complex2real_matrix(z):
    """[..., M, K] complex -> [..., 2M, 2K] real block form
    [[Re, -Im], [Im, Re]]."""
    z = jnp.asarray(z)
    re, im = jnp.real(z), jnp.imag(z)
    top = jnp.concatenate([re, -im], axis=-1)
    bot = jnp.concatenate([im, re], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def real2complex_matrix(z):
    """Inverse of :func:`complex2real_matrix`."""
    z = jnp.asarray(z)
    m = z.shape[-2] // 2
    k = z.shape[-1] // 2
    return z[..., :m, :k] + 1j * z[..., m:, :k]


def complex2real_covariance(r):
    """Covariance of the real-composite representation: [..., 2M, 2M]
    with 1/2 scaling (circular symmetry)."""
    r = jnp.asarray(r)
    q = complex2real_matrix(r)
    return q / 2


def real2complex_covariance(q):
    """Inverse of :func:`complex2real_covariance`."""
    q = jnp.asarray(q)
    m = q.shape[-2] // 2
    return 2 * (q[..., :m, :m] + 1j * q[..., m:, :m])


def complex2real_channel(y, h, s):
    """Real-valued representation of a complex MIMO channel."""
    return (complex2real_vector(y), complex2real_matrix(h),
            complex2real_covariance(s))


def real2complex_channel(y, h, s):
    """Inverse of :func:`complex2real_channel`."""
    return (real2complex_vector(y), real2complex_matrix(h),
            real2complex_covariance(s))


def whiten_channel(y, h, s, return_s=True):
    """Whitens y = Hx + n by L^{-1} with S = L L^H
    (reference utils.py:292)."""
    y = jnp.asarray(y)
    h = jnp.asarray(h)
    s = jnp.asarray(s)
    l_inv = inv_cholesky(s)
    yw = jnp.matmul(l_inv, y[..., None])[..., 0]
    hw = jnp.matmul(l_inv, h)
    if return_s:
        sw = jnp.broadcast_to(
            jnp.eye(s.shape[-1], dtype=s.dtype), s.shape)
        return yw, hw, sw
    return yw, hw


class List2LLR(Block):
    """Abstract candidate-list-to-LLR computer
    (reference utils.py:358)."""

    def call(self, y, r, dists, path_inds, path_syms):
        raise NotImplementedError


class List2LLRSimple(List2LLR):
    """Max-log LLRs from a candidate list:
    LLR(k,i) = min_{C0} d - min_{C1} d, clipped
    (reference utils.py:420)."""

    def __init__(self, num_bits_per_symbol, llr_clip_val=20.0,
                 precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        self._num_bits_per_symbol = int(num_bits_per_symbol)
        self.llr_clip_val = llr_clip_val
        k = self._num_bits_per_symbol
        n = 2 ** k
        ints = np.arange(n)
        shifts = np.arange(k - 1, -1, -1)
        # bits[c, i] in {0, 1}, MSB first (matching the Mapper labels)
        self._bits = ((ints[:, None] >> shifts[None, :]) & 1).astype(
            np.int32)

    @property
    def llr_clip_val(self):
        return self._llr_clip_val

    @llr_clip_val.setter
    def llr_clip_val(self, value):
        self._llr_clip_val = float(value)

    def call(self, y, r, dists, path_inds, path_syms):
        # dists: [..., num_paths]; path_inds: [..., num_paths, S]
        dists = jnp.asarray(dists, self.rdtype)
        path_inds = jnp.asarray(path_inds)
        big = jnp.asarray(jnp.finfo(self.rdtype).max / 2, self.rdtype)
        # bits of each candidate symbol:
        # [..., paths, S, num_bits]
        bits = jnp.take(jnp.asarray(self._bits), path_inds, axis=0)
        d = dists[..., None, None]  # broadcast to [..., paths, S, bits]
        d0 = jnp.where(bits == 0, d, big)
        d1 = jnp.where(bits == 1, d, big)
        min0 = jnp.min(d0, axis=-3)
        min1 = jnp.min(d1, axis=-3)
        llr = min0 - min1
        # empty-set handling: if no candidate with bit=0 (min0 == big),
        # LLR = +clip; if none with bit=1, LLR = -clip
        llr = jnp.where(min0 >= big, self._llr_clip_val, llr)
        llr = jnp.where(min1 >= big, -self._llr_clip_val, llr)
        return jnp.clip(llr, -self._llr_clip_val, self._llr_clip_val)
