"""5G NR LDPC encoder per 3GPP TS 38.212 incl. rate matching
(reference: src/sionna/phy/fec/ldpc/encoding.py:14).

TPU-native design: encoding runs entirely in the *block-circulant
domain*. The info word is shaped [batch, k_b, Z]; every base-graph
entry is a cyclic shift (one XLA gather over a static index map), the
core parity p_a follows from the closed-form inverse of the
double-diagonal B submatrix (shifted identities), and the extension
parities are one batched one-hot contraction on the MXU. No sparse
matrices, no scatter.
"""

import numbers
import os

import numpy as np
import scipy.sparse as sp_sparse

import jax.numpy as jnp

from ...block import Block

__all__ = ["LDPC5GEncoder"]

_CODES_DIR = os.path.join(os.path.dirname(__file__), "codes")

# lifting sets per 38.212 Tab 5.3.2-1
_LIFTING_SETS = [
    [2, 4, 8, 16, 32, 64, 128, 256],
    [3, 6, 12, 24, 48, 96, 192, 384],
    [5, 10, 20, 40, 80, 160, 320],
    [7, 14, 28, 56, 112, 224],
    [9, 18, 36, 72, 144, 288],
    [11, 22, 44, 88, 176, 352],
    [13, 26, 52, 104, 208],
    [15, 30, 60, 120, 240],
]

_BG_SHAPE = {"bg1": (46, 68), "bg2": (42, 52)}
_BG_CSV_CACHE = {}


def _load_bg_csv(bg):
    if bg not in _BG_CSV_CACHE:
        _BG_CSV_CACHE[bg] = np.genfromtxt(
            os.path.join(_CODES_DIR, f"5G_{bg}.csv"), delimiter=";")
    return _BG_CSV_CACHE[bg]


def _select_basegraph(k, r, bg=None):
    """Basegraph selection per TS 38.212 Sec. 7.2.2."""
    if bg is None:
        if k <= 292:
            bg = "bg2"
        elif k <= 3824 and r <= 0.67:
            bg = "bg2"
        elif r <= 0.25:
            bg = "bg2"
        else:
            bg = "bg1"
    elif bg not in ("bg1", "bg2"):
        raise ValueError("Basegraph must be bg1, bg2 or None.")
    if bg == "bg1" and k > 8448:
        raise ValueError("K is not supported by BG1 (too large).")
    if bg == "bg2" and k > 3840:
        raise ValueError(f"K is not supported by BG2 (too large) k={k}.")
    if bg == "bg1" and r < 1 / 3:
        raise ValueError("Only coderate > 1/3 supported for BG1.")
    if bg == "bg2" and r < 1 / 5:
        raise ValueError("Only coderate > 1/5 supported for BG2.")
    return bg


def _select_lifting(k, bg):
    """Lifting selection per TS 38.212 Sec. 5.2.2 (min Z with
    k_b*Z >= k)."""
    if bg == "bg1":
        k_b = 22
    else:
        if k > 640:
            k_b = 10
        elif k > 560:
            k_b = 9
        elif k > 192:
            k_b = 8
        else:
            k_b = 6
    best = None
    for i_ls, s in enumerate(_LIFTING_SETS):
        for z in s:
            if k_b * z >= k and (best is None or k_b * z < best[0]):
                best = (k_b * z, z, i_ls)
    _, z, i_ls = best
    k_b = 22 if bg == "bg1" else 10
    return z, i_ls, k_b


def _load_basegraph(i_ls, bg):
    """Base matrix [m_b, n_b] with -1 for zero blocks and the shift
    value for set ``i_ls`` otherwise."""
    if not 0 <= i_ls <= 7:
        raise ValueError("i_ls out of range.")
    bm = np.full(_BG_SHAPE[bg], -1.0)
    csv = _load_bg_csv(bg)
    r_ind = 0
    for r in range(2, csv.shape[0]):
        if not np.isnan(csv[r, 0]):
            r_ind = int(csv[r, 0])
        c_ind = int(csv[r, 1])
        bm[r_ind, c_ind] = csv[r, i_ls + 2]
    return bm


def _lift_basegraph(bm, z):
    """Lifted sparse parity-check matrix (scipy CSR), for the decoder
    and for validation."""
    rows, cols, data = [], [], []
    im = np.arange(z)
    for r in range(bm.shape[0]):
        for c in range(bm.shape[1]):
            s = bm[r, c]
            if s == -1:
                continue
            rows.append(r * z + im)
            cols.append(c * z + np.mod(im + int(s), z))
            data.append(np.ones(z))
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    data = np.concatenate(data)
    return sp_sparse.csr_matrix(
        (data, (rows, cols)), shape=(z * bm.shape[0], z * bm.shape[1]))


def _entries(bm, row_range, col_range):
    """(rows, cols, shifts) of non-zero blocks within the given
    (row, col) window, z-mod-ed shifts."""
    rs, cs, ss = [], [], []
    for r in range(*row_range):
        for c in range(*col_range):
            if bm[r, c] != -1:
                rs.append(r - row_range[0])
                cs.append(c - col_range[0])
                ss.append(int(bm[r, c]))
    return np.asarray(rs), np.asarray(cs), np.asarray(ss)


class LDPC5GEncoder(Block):
    """5G NR LDPC encoder with rate matching (TS 38.212).

    Input [..., k] binary -> output [..., n].
    """

    def __init__(self, k, n, num_bits_per_symbol=None, bg=None,
                 precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        if not isinstance(k, numbers.Number):
            raise TypeError("k must be a number.")
        if not isinstance(n, numbers.Number):
            raise TypeError("n must be a number.")
        k = int(k)
        n = int(n)
        if k > 8448:
            raise ValueError("Unsupported code length (k too large).")
        if k < 12:
            raise ValueError("Unsupported code length (k too small).")
        if n > 316 * 384:
            raise ValueError("Unsupported code length (n too large).")
        if n < 0:
            raise ValueError("Unsupported code length (n negative).")
        self._k = k
        self._n = n
        self._coderate = k / n
        if self._coderate > 948 / 1024:
            print(f"Warning: effective coderate r>948/1024 for n={n}, "
                  f"k={k}.")
        if self._coderate > 0.95:
            raise ValueError(
                f"Unsupported coderate (r>0.95) for n={n}, k={k}.")
        if self._coderate < 1 / 5:
            raise ValueError("Unsupported coderate (r<1/5).")

        self._bg = _select_basegraph(k, self._coderate, bg)
        self._z, self._i_ls, self._k_b = _select_lifting(k, self._bg)
        self._bm = _load_basegraph(self._i_ls, self._bg)
        m_b, n_b = self._bm.shape
        self._m_b, self._n_b = m_b, n_b
        self._n_ldpc = n_b * self._z
        self._k_ldpc = self._k_b * self._z

        self._pcm = _lift_basegraph(self._bm, self._z)

        # --- host precompute of block-domain encode structure -------
        z = self._z
        k_b = self._k_b
        # A part: rows 0..3, info columns
        ra, ca, sa = _entries(self._bm, (0, 4), (0, k_b))
        self._A = (ra, ca, np.mod(sa, z))
        # B submatrix shifts for the closed-form inverse
        self._pm_a = int(self._bm[0, k_b]) % z
        if self._bg == "bg1":
            self._pm_b_inv = int(-self._bm[1, k_b]) % z
        else:
            self._pm_b_inv = int(-self._bm[2, k_b]) % z
        # C1: rows 4.., info columns ; C2: rows 4.., parity cols 0..3
        r1, c1, s1 = _entries(self._bm, (4, m_b), (0, k_b))
        self._C1 = (r1, c1, np.mod(s1, z))
        r2, c2, s2 = _entries(self._bm, (4, m_b), (k_b, k_b + 4))
        self._C2 = (r2, c2, np.mod(s2, z))

        # gather maps: idx[e, j] = col_e * z + (j + shift_e) % z
        self._gA = self._make_gather(self._A, z)
        self._gC1 = self._make_gather(self._C1, z)
        self._gC2 = self._make_gather(self._C2, z)
        # one-hot row reduction matrices
        self._rA = self._make_rowsum(self._A[0], 4)
        self._rC1 = self._make_rowsum(self._C1[0], m_b - 4)
        self._rC2 = self._make_rowsum(self._C2[0], m_b - 4)

        # output interleaver per TS 38.212 Sec. 5.4.2.2
        self._num_bits_per_symbol = num_bits_per_symbol
        if num_bits_per_symbol is not None:
            self._out_int, self._out_int_inv = self.generate_out_int(
                n, num_bits_per_symbol)
        else:
            self._out_int, self._out_int_inv = None, None

    @staticmethod
    def _make_gather(entries, z):
        _, cols, shifts = entries
        j = np.arange(z)[None, :]
        idx = cols[:, None] * z + np.mod(j + shifts[:, None], z)
        return idx.astype(np.int32)

    @staticmethod
    def _make_rowsum(rows, num_rows):
        m = np.zeros((len(rows), num_rows), np.float32)
        m[np.arange(len(rows)), rows] = 1.0
        return m

    # ------------------------------------------------------------------
    # Properties (API parity with reference encoding.py:140-246)
    # ------------------------------------------------------------------
    @property
    def k(self):
        return self._k

    @property
    def n(self):
        return self._n

    @property
    def coderate(self):
        return self._coderate

    @property
    def k_ldpc(self):
        return self._k_ldpc

    @property
    def n_ldpc(self):
        return self._n_ldpc

    @property
    def pcm(self):
        """scipy CSR lifted parity-check matrix"""
        return self._pcm

    @property
    def z(self):
        return self._z

    @property
    def num_bits_per_symbol(self):
        return self._num_bits_per_symbol

    @property
    def out_int(self):
        return self._out_int

    @property
    def out_int_inv(self):
        return self._out_int_inv

    @staticmethod
    def generate_out_int(n, num_bits_per_symbol):
        """Rate-matching output interleaver pattern (TS 38.212
        Sec. 5.4.2.2): bit i+j*Q reads from i*(n/Q)+j."""
        n = int(n)
        num_bits_per_symbol = int(num_bits_per_symbol)
        if n % num_bits_per_symbol != 0:
            raise ValueError("n must be a multiple of num_bits_per_symbol.")
        q = num_bits_per_symbol
        rows = n // q
        j = np.arange(rows)
        i = np.arange(q)
        perm_seq = (i[None, :] * rows + j[:, None]).reshape(-1)
        perm_seq_inv = np.argsort(perm_seq)
        return perm_seq, perm_seq_inv

    # ------------------------------------------------------------------
    # Encoding
    # ------------------------------------------------------------------
    def _apply(self, x, s):
        """Circulant block action P^s: y[i] = x[(i+s) mod Z]."""
        return jnp.roll(x, -s, axis=-1)

    def _rows_sum(self, entries, srcs, num_rows, batch, dtype):
        """Per-base-row GF(2)-pre-sums of shifted column blocks:
        y[r] = sum_{(r,c,s)} roll(srcs[c], -s).  ``srcs`` is a list of
        [B, Z] blocks; returns a list of [B, Z] integer-valued floats.

        Static rolls + unrolled adds (the lifted-decoder-engine
        formulation): XLA fuses the add chains per row, so nothing
        like the former [B, E, Z] gather intermediate (~0.6 GB at the
        flagship batch) ever materializes — measured 2.4x faster at
        batch 2048 on v5e."""
        rs, cs, ss = entries
        acc = [None] * num_rows
        for r, c, s in zip(rs, cs, ss):
            v = jnp.roll(srcs[c], -int(s), axis=-1)
            acc[r] = v if acc[r] is None else acc[r] + v
        z = self._z
        return [jnp.zeros((batch, z), dtype) if a is None else a
                for a in acc]

    def _encode_core(self, u_fill):
        """Full codeword [B, n_ldpc] from filler-padded info bits
        [B, k_ldpc] (before rate matching)."""
        batch = u_fill.shape[0]
        z = self._z
        dtype = u_fill.dtype
        xs = [u_fill[:, c * z:(c + 1) * z] for c in range(self._k_b)]
        # ---- core parities p_a via closed-form B^{-1} --------------
        lam = [jnp.mod(a, 2) for a in
               self._rows_sum(self._A, xs, 4, batch, dtype)]
        lam_sum = jnp.mod(lam[0] + lam[1] + lam[2] + lam[3], 2)
        t = self._apply(lam_sum, self._pm_a + self._pm_b_inv)
        pa0 = self._apply(lam_sum, self._pm_b_inv)
        pa1 = jnp.mod(lam[0] + t, 2)
        if self._bg == "bg1":
            pa2 = jnp.mod(t + lam[2] + lam[3], 2)
        else:
            pa2 = jnp.mod(lam[0] + lam[1] + t, 2)
        pa3 = jnp.mod(t + lam[3], 2)
        p_a = [pa0, pa1, pa2, pa3]

        # ---- extension parities p_b --------------------------------
        pb1 = self._rows_sum(self._C1, xs, self._m_b - 4, batch, dtype)
        pb2 = self._rows_sum(self._C2, p_a, self._m_b - 4, batch,
                             dtype)
        p_b = [jnp.mod(a + b, 2) for a, b in zip(pb1, pb2)]

        return jnp.concatenate([u_fill] + p_a + p_b,
                               axis=1)  # [B, n_ldpc]

    def call(self, bits):
        bits = jnp.asarray(bits)
        input_shape = bits.shape
        u = jnp.reshape(bits, (-1, self._k)).astype(self.rdtype)
        batch = u.shape[0]
        z = self._z

        # filler bits to k_ldpc
        u_fill = jnp.concatenate(
            [u, jnp.zeros((batch, self._k_ldpc - self._k), self.rdtype)],
            axis=1)

        c = self._encode_core(u_fill)

        # ---- rate matching -----------------------------------------
        # remove filler bits
        c_no_filler = jnp.concatenate(
            [c[:, :self._k], c[:, self._k_ldpc:]], axis=1)
        # puncture first 2Z systematic bits; keep n bits
        c_short = c_no_filler[:, 2 * z:2 * z + self._n]
        if self._num_bits_per_symbol is not None:
            c_short = jnp.take(c_short,
                               jnp.asarray(self._out_int, jnp.int32),
                               axis=-1)
        out_shape = tuple(input_shape[:-1]) + (self._n,)
        return jnp.reshape(c_short, out_shape)
