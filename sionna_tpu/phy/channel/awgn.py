"""AWGN channel (reference: src/sionna/phy/channel/awgn.py:10)."""

import jax
import jax.numpy as jnp

from ..block import Block
from ..config import config
from ..utils.tensors import expand_to_rank


class AWGN(Block):
    """Adds complex AWGN with variance ``no`` to the input.

    Input: ``(x, no)`` where ``no`` broadcasts to ``x``. Pass ``key``
    for a functional PRNG stream (required under jit).
    """

    def __init__(self, precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)

    def call(self, x, no, key=None):
        x = jnp.asarray(x, self.cdtype)
        if key is None:
            key = config.next_key()
        kr, ki = jax.random.split(key)
        no = jnp.asarray(no, self.rdtype)
        no = expand_to_rank(no, x.ndim, axis=-1)
        stddev = jnp.sqrt(no / 2).astype(self.rdtype)
        noise = (stddev * jax.random.normal(kr, x.shape, self.rdtype)
                 + 1j * stddev * jax.random.normal(ki, x.shape, self.rdtype)
                 ).astype(self.cdtype)
        return x + noise
