"""Discrete memoryless channels with differentiable (Gumbel-softmax)
sampling (reference: src/sionna/phy/channel/discrete_channel.py:10,298,
387,480; fresh JAX implementations).

Gradients flow through the error sampling via the Gumbel-softmax trick
with a straight-through binarizer, as in the reference
(discrete_channel.py:99-126,191-222).
"""

import jax
import jax.numpy as jnp

from ..block import Block
from ..config import config
from ..utils.tensors import expand_to_rank

__all__ = ["BinaryMemorylessChannel", "BinarySymmetricChannel",
           "BinaryErasureChannel", "BinaryZChannel"]


@jax.custom_vjp
def _ste_binarizer(x):
    """Hard decision with identity gradient."""
    return jnp.where(x < 0.5, 0., 1.)


def _ste_fwd(x):
    return _ste_binarizer(x), None


def _ste_bwd(_, g):
    return (g,)


_ste_binarizer.defvjp(_ste_fwd, _ste_bwd)


@jax.custom_vjp
def _xor_ste(a, b):
    """XOR via |a - b| with straight-through gradients."""
    return jnp.abs(a - b)


def _xor_fwd(a, b):
    return _xor_ste(a, b), None


def _xor_bwd(_, g):
    return g, g


_xor_ste.defvjp(_xor_fwd, _xor_bwd)


class BinaryMemorylessChannel(Block):
    """Binary channel with asymmetric flip probabilities pb=(p0, p1).

    Call: (x, pb[, key]). Output bits (or LLRs in the logit convention
    if ``return_llrs``)."""

    def __init__(self, return_llrs=False, bipolar_input=False,
                 llr_max=100., precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        self._return_llrs = bool(return_llrs)
        self._bipolar_input = bool(bipolar_input)
        self._llr_max = float(llr_max)
        self._temperature = 0.1
        self._eps = 1e-9

    @property
    def llr_max(self):
        return self._llr_max

    @llr_max.setter
    def llr_max(self, value):
        if value < 0:
            raise ValueError("llr_max cannot be negative.")
        self._llr_max = float(value)

    @property
    def temperature(self):
        return self._temperature

    @temperature.setter
    def temperature(self, value):
        if value < 0:
            raise ValueError("temperature cannot be negative.")
        self._temperature = float(value)

    def _sample_errors(self, pb, shape, key):
        """Differentiable Bernoulli(pb) via Gumbel-softmax + STE."""
        k1, k2 = jax.random.split(key)
        u1 = jax.random.uniform(k1, shape, self.rdtype)
        u2 = jax.random.uniform(k2, shape, self.rdtype)
        u = jnp.stack((u1, u2), axis=-1)
        eps = self._eps
        q = -jnp.log(-jnp.log(u + eps) + eps)
        pb = jnp.asarray(pb, self.rdtype)
        p = jnp.stack((pb, 1 - pb), axis=-1)
        p = expand_to_rank(p, q.ndim, axis=0)
        p = jnp.broadcast_to(p, q.shape)
        a = (jnp.log(p + eps) + q) / self._temperature
        e_cat = jax.nn.softmax(a, axis=-1)
        return _ste_binarizer(e_cat[..., 0])

    def call(self, x, pb, key=None):
        x = jnp.asarray(x, self.rdtype)
        if key is None:
            key = config.next_key()
        if isinstance(pb, (tuple, list)):
            pb0, pb1 = pb
        else:
            pb = jnp.asarray(pb, self.rdtype)
            pb0, pb1 = pb[..., 0], pb[..., 1]
        pb0 = jnp.clip(jnp.asarray(pb0, self.rdtype), 0., 1.)
        pb1 = jnp.clip(jnp.asarray(pb1, self.rdtype), 0., 1.)
        k0, k1 = jax.random.split(key)
        e0 = self._sample_errors(pb0, x.shape, k0)
        e1 = self._sample_errors(pb1, x.shape, k1)
        neutral = -1. if self._bipolar_input else 0.
        e = jnp.where(x == neutral, e0, e1)
        if self._bipolar_input:
            y = x * (-2 * e + 1)
        else:
            y = _xor_ste(x, e)
        if self._return_llrs:
            if not self._bipolar_input:
                y = 2 * y - 1
            eps = self._eps
            y0 = -(jnp.log(pb1 + eps) - jnp.log(1 - pb0 - eps))
            y1 = (jnp.log(1 - pb1 - eps) - jnp.log(pb0 + eps))
            y = jnp.where(y == 1, y1, y0).astype(y.dtype) * y
            y = jnp.clip(y, -self._llr_max, self._llr_max)
        return y


class BinarySymmetricChannel(BinaryMemorylessChannel):
    """BSC: symmetric flips with probability pb
    (reference discrete_channel.py:298)."""

    def call(self, x, pb, key=None):
        pb = jnp.asarray(pb, self.rdtype)
        return super().call(x, jnp.stack((pb, pb), axis=-1), key=key)


class BinaryZChannel(BinaryMemorylessChannel):
    """Z-channel: only 1->0 errors with probability pb
    (reference discrete_channel.py:387)."""

    def call(self, x, pb, key=None):
        pb = jnp.asarray(pb, self.rdtype)
        return super().call(
            x, jnp.stack((jnp.zeros_like(pb), pb), axis=-1), key=key)


class BinaryErasureChannel(BinaryMemorylessChannel):
    """BEC: erases with probability pb; erasures marked -1 (binary
    input) or 0 (bipolar) (reference discrete_channel.py:480)."""

    def call(self, x, pb, key=None):
        x = jnp.asarray(x, self.rdtype)
        if key is None:
            key = config.next_key()
        pb = jnp.clip(jnp.asarray(pb, self.rdtype), 0., 1.)
        e = self._sample_errors(pb, x.shape, key)
        if self._return_llrs:
            if not self._bipolar_input:
                x = 2 * x - 1
            x = x * self._llr_max
            y = jnp.where(e == 1, jnp.zeros_like(x), x)
        else:
            erased = 0. if self._bipolar_input else -1.
            y = jnp.where(e == 0, x, jnp.full_like(x, erased))
        return y
