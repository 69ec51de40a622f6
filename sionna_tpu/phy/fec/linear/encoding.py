"""Universal linear encoder (reference:
src/sionna/phy/fec/linear/encoding.py:10)."""

import numpy as np

import jax.numpy as jnp

from ...block import Block
from ..utils import pcm2gm

__all__ = ["LinearEncoder"]


class LinearEncoder(Block):
    """Encodes with an arbitrary binary generator matrix (one GF(2)
    matmul on the MXU).

    Input [..., k] -> [..., n].
    """

    def __init__(self, enc_mat, *, is_pcm=False, precision=None,
                 **kwargs):
        super().__init__(precision=precision, **kwargs)
        enc_mat = np.asarray(enc_mat)
        if not np.all(np.isin(enc_mat, [0, 1])):
            raise ValueError("enc_mat is not binary.")
        if enc_mat.ndim != 2:
            raise ValueError("enc_mat must be 2-D array.")
        if is_pcm:
            self._gm = pcm2gm(enc_mat, verify_results=True)
        else:
            self._gm = enc_mat
        self._gm = self._gm.astype(np.float32)
        self._k = self._gm.shape[0]
        self._n = self._gm.shape[1]

    @property
    def k(self):
        return self._k

    @property
    def n(self):
        return self._n

    @property
    def gm(self):
        return self._gm

    @property
    def coderate(self):
        return self._k / self._n

    def call(self, bits):
        bits = jnp.asarray(bits, self.rdtype)
        gm = jnp.asarray(self._gm, self.rdtype)
        c = jnp.matmul(bits, gm)
        return jnp.mod(c, 2)
