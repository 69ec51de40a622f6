"""Polar encoding (reference: src/sionna/phy/fec/polar/encoding.py:14,
211; fresh JAX implementations).

TPU design: the polar transform is log2(n) fully-vectorized butterfly
stages (reshape + XOR), no gathers; 5G rate matching reduces to one
static permutation gather precomputed on the host.
"""

import numbers

import numpy as np

import jax.numpy as jnp

from ...block import Block
from ..crc import CRCEncoder
from .utils import generate_5g_ranking

__all__ = ["PolarEncoder", "Polar5GEncoder"]


class PolarEncoder(Block):
    """Polar encoder for given frozen positions.

    Input [..., k] -> codeword [..., n] via the n = 2^m polar
    transform.
    """

    def __init__(self, frozen_pos, n, precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        if not isinstance(n, numbers.Number):
            raise TypeError("n must be a number.")
        n = int(n)
        frozen_pos = np.asarray(frozen_pos)
        if not np.issubdtype(frozen_pos.dtype, np.integer):
            raise TypeError("frozen_pos contains non int.")
        if len(frozen_pos) > n:
            raise ValueError("Num. of elements in frozen_pos cannot be "
                             "greater than n.")
        if np.log2(n) != int(np.log2(n)):
            raise ValueError("n must be a power of 2.")
        self._n = n
        self._frozen_pos = frozen_pos
        self._k = n - len(frozen_pos)
        self._info_pos = np.setdiff1d(np.arange(n), frozen_pos)
        self._num_stages = int(np.log2(n))
        # scatter info bits into u of length n: static permutation
        perm = np.zeros(n, np.int32)
        # u[j] = bits[pos] for info positions; frozen positions read a
        # zero slot appended at index k
        perm[:] = self._k
        perm[self._info_pos] = np.arange(self._k)
        self._scatter_perm = perm

    @property
    def k(self):
        return self._k

    @property
    def n(self):
        return self._n

    @property
    def frozen_pos(self):
        return self._frozen_pos

    @property
    def info_pos(self):
        return self._info_pos

    def _transform(self, u):
        """Polar transform c = u G_N via butterfly stages."""
        shape = u.shape
        n = self._n
        x = u
        for s in range(self._num_stages):
            block = 2 << s      # current block length
            half = 1 << s
            x = jnp.reshape(x, shape[:-1] + (n // block, 2, half))
            upper = jnp.mod(x[..., 0, :] + x[..., 1, :], 2)
            x = jnp.stack([upper, x[..., 1, :]], axis=-2)
            x = jnp.reshape(x, shape[:-1] + (n,))
        return x

    def call(self, bits):
        bits = jnp.asarray(bits, self.rdtype)
        if bits.shape[-1] != self._k:
            raise ValueError(
                f"Last input dimension must be of length {self._k}.")
        zero = jnp.zeros(bits.shape[:-1] + (1,), bits.dtype)
        src = jnp.concatenate([bits, zero], axis=-1)
        u = jnp.take(src, jnp.asarray(self._scatter_perm), axis=-1)
        return self._transform(u)


class Polar5GEncoder(PolarEncoder):
    """5G-compliant polar encoder: CRC attachment, (downlink) input
    interleaving, polar transform, sub-block interleaving, rate
    matching (puncturing/shortening/repetition), and (uplink) channel
    interleaving (TS 38.212 Sec. 5.3.1/5.4.1)."""

    def __init__(self, k, n, channel_type="uplink", verbose=False,
                 precision=None, **kwargs):
        if not isinstance(k, numbers.Number):
            raise TypeError("k must be a number.")
        if not isinstance(n, numbers.Number):
            raise TypeError("n must be a number.")
        k = int(k)
        n = int(n)
        if channel_type not in ("uplink", "downlink"):
            raise ValueError("channel_type must be uplink or downlink")
        self._channel_type = channel_type
        self._verbose = bool(verbose)
        self._k_target = k
        self._n_target = n

        (crc_pol, n_polar, frozen_pos, idx_rate_matched,
         ind_input_int) = self._init_rate_match(k, n)
        super().__init__(frozen_pos, n_polar, precision=precision,
                         **kwargs)
        self._enc_crc = CRCEncoder(crc_pol, precision=precision)
        self._k_polar = k + self._enc_crc.crc_length
        self._n_polar = n_polar
        self._ind_rate_matching = idx_rate_matched.astype(np.int32)
        self._ind_input_int = None if ind_input_int is None \
            else ind_input_int.astype(np.int32)

    # ------------------------------------------------------------------
    @property
    def enc_crc(self):
        return self._enc_crc

    @property
    def k_target(self):
        return self._k_target

    @property
    def n_target(self):
        return self._n_target

    @property
    def k_polar(self):
        return self._k_polar

    @property
    def n_polar(self):
        return self._n_polar

    @property
    def k(self):
        return self._k_target

    @property
    def n(self):
        return self._n_target

    # ------------------------------------------------------------------
    @staticmethod
    def subblock_interleaving(u):
        """Sub-block interleaving per TS 38.212 Sec. 5.4.1.1."""
        u = np.asarray(u)
        k = u.shape[-1]
        if k % 32 != 0:
            raise ValueError("length for sub-block interleaving must "
                             "be a multiple of 32.")
        perm = np.array([0, 1, 2, 4, 3, 5, 6, 7, 8, 16, 9, 17, 10, 18,
                         11, 19, 12, 20, 13, 21, 14, 22, 15, 23, 24,
                         25, 26, 28, 27, 29, 30, 31])
        y = np.zeros_like(u)
        for m in range(k):
            i = int(np.floor(32 * m / k))
            j = int(perm[i] * k / 32 + np.mod(m, k / 32))
            y[m] = u[j]
        return y

    @staticmethod
    def channel_interleaver(c):
        """Triangular channel interleaver per TS 38.212
        Sec. 5.4.1.3."""
        c = np.asarray(c)
        n = c.shape[-1]
        c_int = np.zeros_like(c)
        t = 0
        while t * (t + 1) / 2 < n:
            t += 1
        v = np.full([t, t], np.nan)
        ind_k = 0
        for i in range(t):
            for j in range(t - i):
                if ind_k < n:
                    v[i, j] = c[ind_k]
                ind_k += 1
        ind_k = 0
        for j in range(t):
            for i in range(t - j):
                if not np.isnan(v[i, j]):
                    c_int[ind_k] = v[i, j]
                    ind_k += 1
        return c_int

    @staticmethod
    def input_interleaver(c):
        """Input bit interleaver (downlink) per TS 38.212
        Tab. 5.3.1.1-1."""
        p_il_max_table = [
            0, 2, 4, 7, 9, 14, 19, 20, 24, 25, 26, 28, 31, 34, 42, 45,
            49, 50, 51, 53, 54, 56, 58, 59, 61, 62, 65, 66, 67, 69, 70,
            71, 72, 76, 77, 81, 82, 83, 87, 88, 89, 91, 93, 95, 98,
            101, 104, 106, 108, 110, 111, 113, 115, 118, 119, 120, 122,
            123, 126, 127, 129, 132, 134, 138, 139, 140, 1, 3, 5, 8,
            10, 15, 21, 27, 29, 32, 35, 43, 46, 52, 55, 57, 60, 63, 68,
            73, 78, 84, 90, 92, 94, 96, 99, 102, 105, 107, 109, 112,
            114, 116, 121, 124, 128, 130, 133, 135, 141, 6, 11, 16, 22,
            30, 33, 36, 44, 47, 64, 74, 79, 85, 97, 100, 103, 117, 125,
            131, 136, 142, 12, 17, 23, 37, 48, 75, 80, 86, 137, 143,
            13, 18, 38, 144, 39, 145, 40, 146, 41, 147, 148, 149, 150,
            151, 152, 153, 154, 155, 156, 157, 158, 159, 160, 161, 162,
            163]
        k_il_max = 164
        c = np.asarray(c)
        k = len(c)
        if k > k_il_max:
            raise ValueError(
                "Input interleaver only defined for length of 164.")
        c_apo = np.empty(k, int)
        i = 0
        for p in p_il_max_table:
            if p >= (k_il_max - k):
                c_apo[i] = c[p - (k_il_max - k)]
                i += 1
        return c_apo

    def _init_rate_match(self, k_target, n_target):
        """Rate-matching initialization per TS 38.212 (returns
        crc_pol, n_polar, frozen_pos, rate-matching gather indices,
        input interleaver indices)."""
        if n_target < k_target:
            raise ValueError("n must be larger or equal k.")
        if n_target < 18:
            raise ValueError(
                "n<18 is not supported by the 5G Polar coding scheme.")
        if k_target > 1013:
            raise ValueError("k too large - currently, no codeword "
                             "segmentation supported.")
        if n_target > 1088:
            raise ValueError("n too large - currently, no codeword "
                             "segmentation supported.")
        if self._channel_type == "uplink":
            if 12 <= k_target <= 19:
                crc_pol, k_crc = "CRC6", 6
                print("Warning: For 12<=k<=19 additional 3 "
                      "parity-check bits are defined in 38.212. They "
                      "are currently not implemented.")
            elif k_target >= 20:
                crc_pol, k_crc = "CRC11", 11
            else:
                raise ValueError(
                    "k_target<12 is not supported in 5G NR uplink.")
            n_max = 10
        else:
            if k_target > 140:
                raise ValueError(
                    "k too large for downlink configuration.")
            if n_target < 25:
                raise ValueError("n too small for downlink "
                                 "configuration with 24 bit CRC.")
            if n_target > 576:
                raise ValueError(
                    "n too large for downlink configuration.")
            crc_pol, k_crc = "CRC24C", 24
            n_max = 9
        n_pc = 0
        k_polar = k_target + k_crc + n_pc
        if k_polar > n_target:
            raise ValueError("k_polar + k_crc + n_pc > n_target is not "
                             "supported.")
        n_min = 5
        if (n_target <= (9 / 8) * 2 ** (np.ceil(np.log2(n_target)) - 1)
                and k_polar / n_target < 9 / 16):
            n1 = np.ceil(np.log2(n_target)) - 1
        else:
            n1 = np.ceil(np.log2(n_target))
        n2 = np.ceil(np.log2(8 * k_polar))
        n_polar = int(2 ** max(min(n1, n2, n_max), n_min))

        prefrozen_pos = []
        if n_target < n_polar:
            if k_polar / n_target <= 7 / 16:
                # puncturing
                n_int = int(32 * np.ceil((n_polar - n_target) / 32))
                int_pattern = self.subblock_interleaving(
                    np.arange(n_int))
                for i in range(n_polar - n_target):
                    prefrozen_pos.append(int(int_pattern[i]))
                if n_target >= 3 * n_polar / 4:
                    t = int(np.ceil(3 / 4 * n_polar - n_target / 2) - 1)
                else:
                    t = int(np.ceil(9 / 16 * n_polar - n_target / 4)
                            - 1)
                for i in range(t):
                    prefrozen_pos.append(i)
            else:
                # shortening
                n_int = int(32 * np.ceil(n_polar / 32))
                int_pattern = self.subblock_interleaving(
                    np.arange(n_int))
                for i in range(n_target, n_polar):
                    prefrozen_pos.append(int(int_pattern[i]))
        prefrozen_pos = np.unique(prefrozen_pos).astype(int)

        ch_ranking, _ = generate_5g_ranking(0, n_polar, sort=False)
        info_cand = np.setdiff1d(ch_ranking, prefrozen_pos,
                                 assume_unique=True)
        info_pos = np.sort(
            [info_cand[-i - 1] for i in range(k_polar)]).astype(int)
        frozen_pos = np.setdiff1d(np.arange(n_polar), info_pos,
                                  assume_unique=True)

        ind_input_int = self.input_interleaver(np.arange(k_polar)) \
            if self._channel_type == "downlink" else None

        ind_sub_int = self.subblock_interleaving(np.arange(n_polar))
        c_int = np.arange(n_polar)
        idx_c_matched = np.zeros(n_target, int)
        if n_target >= n_polar:
            for ind in range(n_target):
                idx_c_matched[ind] = c_int[ind % n_polar]
        elif k_polar / n_target <= 7 / 16:
            for ind in range(n_target):
                idx_c_matched[ind] = c_int[ind + n_polar - n_target]
        else:
            for ind in range(n_target):
                idx_c_matched[ind] = c_int[ind]

        if self._channel_type == "uplink":
            ind_channel_int = self.channel_interleaver(
                np.arange(n_target))
            idx_rate_matched = ind_sub_int[
                idx_c_matched[ind_channel_int]]
        else:
            idx_rate_matched = ind_sub_int[idx_c_matched]
        return (crc_pol, n_polar, frozen_pos,
                np.asarray(idx_rate_matched), ind_input_int)

    def call(self, bits):
        bits = jnp.asarray(bits, self.rdtype)
        if bits.shape[-1] != self._k_target:
            raise ValueError("Invalid input shape.")
        in_shape = bits.shape
        u = jnp.reshape(bits, (-1, self._k_target))
        u_crc = self._enc_crc(u)
        if self._channel_type == "downlink":
            u_crc = jnp.take(u_crc, jnp.asarray(self._ind_input_int),
                             axis=-1)
        c = PolarEncoder.call(self, u_crc)
        c_matched = jnp.take(c, jnp.asarray(self._ind_rate_matching),
                             axis=1)
        return jnp.reshape(c_matched,
                           tuple(in_shape[:-1]) + (self._n_target,))
