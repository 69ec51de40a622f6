"""CRC encoding/decoding (reference: src/sionna/phy/fec/crc.py:11,218).

3GPP TS 38.212 Sec. 5.1 CRC polynomials. TPU design: the parity bits
are computed as a single GF(2) matrix product ``u @ P mod 2``, where
the k x crc_length parity matrix ``P`` is precomputed on the host
(cached per k) - one MXU matmul instead of a shift register.
"""

import numpy as np

import jax.numpy as jnp

from ..block import Block

_CRC_COEFFS = {
    "CRC24A": [24, 23, 18, 17, 14, 11, 10, 7, 6, 5, 4, 3, 1, 0],
    "CRC24B": [24, 23, 6, 5, 1, 0],
    "CRC24C": [24, 23, 21, 20, 17, 15, 13, 12, 8, 4, 2, 1, 0],
    "CRC16": [16, 12, 5, 0],
    "CRC11": [11, 10, 9, 5, 0],
    "CRC6": [6, 5, 0],
}


def _crc_parity_matrix(k, crc_degree):
    """[k, d] GF(2) matrix P with CRC(u) = u @ P mod 2.

    Row i is x^(d + k - 1 - i) mod g(x), computed by iterating the
    polynomial shift on the host.
    """
    coeffs = _CRC_COEFFS[crc_degree]
    d = coeffs[0]
    # g(x) taps below degree d (coefficients of x^0..x^{d-1})
    g_low = np.zeros(d, np.uint8)
    for c in coeffs[1:]:
        g_low[c] = 1

    # r = x^d mod g = g_low (since x^d = g(x) - low part in GF(2))
    rows = np.zeros((k, d), np.uint8)
    r = g_low.copy()
    rows[k - 1] = r
    for i in range(k - 2, -1, -1):
        # r <- r * x mod g
        carry = r[d - 1]
        r = np.roll(r, 1)
        r[0] = 0
        if carry:
            r ^= g_low
        rows[i] = r
    # 3GPP appends the remainder MSB-first (coefficient of x^{d-1}
    # first); rows store coefficients of x^0..x^{d-1}
    return rows[:, ::-1]


class CRCEncoder(Block):
    """Appends a CRC to the last axis of the input bit tensor.

    Input [..., k] -> output [..., k + crc_degree].
    """

    def __init__(self, crc_degree, *, precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        if crc_degree not in _CRC_COEFFS:
            raise ValueError(f"Invalid crc_degree: {crc_degree}")
        self._crc_degree = crc_degree
        self._crc_length = _CRC_COEFFS[crc_degree][0]
        self._pmats = {}  # cache: k -> parity matrix
        self._k = None
        self._n = None

    @property
    def crc_degree(self):
        return self._crc_degree

    @property
    def crc_length(self):
        return self._crc_length

    @property
    def k(self):
        return self._k

    @property
    def n(self):
        return self._n

    def _get_pmat(self, k):
        if k not in self._pmats:
            self._pmats[k] = _crc_parity_matrix(
                k, self._crc_degree).astype(np.float32)
        return self._pmats[k]

    def call(self, bits):
        bits = jnp.asarray(bits)
        k = bits.shape[-1]
        self._k = k
        self._n = k + self._crc_length
        pmat = jnp.asarray(self._get_pmat(k), self.rdtype)
        # GF(2) product via real matmul + mod 2 (exact in f32 for
        # k < 2^24)
        parity = jnp.matmul(bits.astype(self.rdtype), pmat)
        parity = jnp.mod(parity, 2)
        return jnp.concatenate([bits.astype(self.rdtype), parity], axis=-1)


class CRCDecoder(Block):
    """Verifies and removes the CRC of the associated
    :class:`CRCEncoder`.

    Input [..., k + crc_degree] -> (bits [..., k], crc_valid [..., 1]
    bool).
    """

    def __init__(self, crc_encoder, *, precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        if not isinstance(crc_encoder, CRCEncoder):
            raise TypeError("crc_encoder must be a CRCEncoder")
        self._encoder = crc_encoder

    @property
    def encoder(self):
        return self._encoder

    def call(self, bits):
        bits = jnp.asarray(bits)
        d = self._encoder.crc_length
        k = bits.shape[-1] - d
        u = bits[..., :k]
        parity_rx = bits[..., k:]
        pmat = jnp.asarray(self._encoder._get_pmat(k), self.rdtype)
        parity = jnp.mod(jnp.matmul(u.astype(self.rdtype), pmat), 2)
        crc_valid = jnp.all(parity == parity_rx, axis=-1, keepdims=True)
        return u, crc_valid
