"""Convolutional encoding (reference:
src/sionna/phy/fec/conv/encoding.py:11; fresh JAX implementation).

TPU design: the encoder runs as one ``lax.scan`` over time with a
[batch] integer state and gathers from the tiny trellis tables; the
termination tail is appended with the same machinery.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ...block import Block
from .utils import Trellis, polynomial_selector

__all__ = ["ConvEncoder"]


class ConvEncoder(Block):
    """Convolutional encoder (poly- or Trellis-defined), optional RSC
    and termination.

    Input [..., k] -> output [..., n] with n = k / rate
    (+ termination symbols if enabled).
    """

    def __init__(self, gen_poly=None, rate=1 / 2, constraint_length=3,
                 rsc=False, terminate=False, precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        if gen_poly is not None:
            if not all(isinstance(p, str) for p in gen_poly):
                raise TypeError("Each element of gen_poly must be a "
                                "string.")
            if not all(len(p) == len(gen_poly[0]) for p in gen_poly):
                raise ValueError(
                    "Each polynomial must be of same length.")
            if not all(all(c in "01" for c in p) for p in gen_poly):
                raise ValueError(
                    "Each polynomial must be a string of 0/1 s.")
            self._gen_poly = gen_poly
        else:
            self._gen_poly = polynomial_selector(rate,
                                                 constraint_length)
        self._rsc = bool(rsc)
        self._terminate = bool(terminate)
        self._coderate_desired = 1 / len(self._gen_poly)
        self._coderate = self._coderate_desired
        self._trellis = Trellis(self._gen_poly, rsc=self._rsc)
        self._mu = self._trellis._mu
        self._conv_n = self._trellis.conv_n

    @property
    def gen_poly(self):
        return self._gen_poly

    @property
    def coderate(self):
        if self._terminate and self._k is not None:
            return self._k / self._n
        return self._coderate

    @property
    def trellis(self):
        return self._trellis

    @property
    def terminate(self):
        return self._terminate

    _k = None
    _n = None

    @property
    def k(self):
        return self._k

    @property
    def n(self):
        return self._n

    def call(self, bits, /):
        bits = jnp.asarray(bits)
        k = bits.shape[-1]
        self._k = k
        term_syms = self._mu if self._terminate else 0
        self._n = (k + term_syms) * self._conv_n
        in_shape = bits.shape
        msg = jnp.reshape(bits, (-1, k)).astype(jnp.int32)
        batch = msg.shape[0]

        to_nodes = jnp.asarray(self._trellis.to_nodes, jnp.int32)
        op_bits = jnp.asarray(self._trellis.op_bits_by_fromnode,
                              jnp.int32)  # [ns, ni, conv_n]

        def step(state, bit):
            out = op_bits[state, bit]      # [batch, conv_n]
            new_state = to_nodes[state, bit]
            return new_state, out

        state0 = jnp.zeros((batch,), jnp.int32)
        state, outs = jax.lax.scan(step, state0,
                                   jnp.transpose(msg, (1, 0)))
        # outs: [k, batch, conv_n]
        cw = jnp.transpose(outs, (1, 0, 2)).reshape(batch, -1)

        if self._terminate:
            if self._rsc:
                fb = jnp.asarray(
                    [int(x) for x in self._gen_poly[0][1:]], jnp.int32)

            def term_step(state, _):
                if self._rsc:
                    # input that drives the register to zero
                    state_bits = jnp.stack(
                        [(state >> (self._mu - 1 - b)) & 1
                         for b in range(self._mu)], axis=-1)
                    bit = jnp.sum(fb * state_bits, axis=-1) % 2
                else:
                    bit = jnp.zeros_like(state)
                out = op_bits[state, bit]
                new_state = to_nodes[state, bit]
                return new_state, out

            _, term_outs = jax.lax.scan(term_step, state,
                                        jnp.arange(term_syms))
            term_cw = jnp.transpose(term_outs, (1, 0, 2)).reshape(
                batch, -1)
            cw = jnp.concatenate([cw, term_cw], axis=-1)

        cw = cw.astype(self.rdtype)
        return jnp.reshape(cw, tuple(in_shape[:-1]) + (self._n,))
