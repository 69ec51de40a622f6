"""Ordered statistics decoding (reference:
src/sionna/phy/fec/linear/decoding.py:14; fresh JAX implementation).

TPU design: the per-sample Gaussian elimination over the
reliability-sorted generator matrix runs as a masked ``lax.fori_loop``
over columns (fixed shapes, traced pivoting); all
:math:`\\sum_{i<=t} {k \\choose i}` candidate codewords are evaluated
as one batched GF(2) matmul + correlation reduction.
"""

from itertools import combinations

import numpy as np

import jax
import jax.numpy as jnp

from ...block import Block
from ..utils import pcm2gm

__all__ = ["OSDecoder"]


class OSDecoder(Block):
    """Order-t ordered statistics decoder for arbitrary linear codes.

    Input llr_ch [..., n] as logits; output hard codeword estimates
    [..., n].
    """

    def __init__(self, enc_mat=None, t=0, is_pcm=False, encoder=None,
                 precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        if encoder is not None:
            # run the encoder once on identity to extract the
            # generator matrix
            k = None
            # probe k by trying common attributes
            if hasattr(encoder, "k") and encoder.k is not None:
                k = int(encoder.k)
            if k is None:
                raise ValueError(
                    "Cannot infer k from encoder; provide enc_mat.")
            eye = jnp.eye(k, dtype=jnp.float32)
            gm = np.asarray(encoder(eye))
            self._gm = gm.astype(np.float32)
        else:
            enc_mat = np.asarray(enc_mat)
            if not np.all(np.isin(enc_mat, [0, 1])):
                raise ValueError("enc_mat must be binary.")
            self._gm = (pcm2gm(enc_mat) if is_pcm else enc_mat
                        ).astype(np.float32)
        self._k, self._n = self._gm.shape
        self._t = int(t)
        # error patterns of weight <= t over k positions
        patterns = [np.zeros(self._k, np.float32)]
        for w in range(1, self._t + 1):
            for pos in combinations(range(self._k), w):
                p = np.zeros(self._k, np.float32)
                p[list(pos)] = 1
                patterns.append(p)
        self._patterns = np.stack(patterns)  # [P, k]

    @property
    def k(self):
        return self._k

    @property
    def n(self):
        return self._n

    @property
    def t(self):
        return self._t

    @property
    def coderate(self):
        return self._k / self._n

    def _gaussian_eliminate(self, g):
        """Row-reduces g [k, n] over GF(2) with column-major pivoting
        (traced). Returns (g_reduced, pivot_cols [k])."""
        k, n = self._k, self._n

        def body(col, state):
            g, pivots, r = state
            col_vals = g[:, col]
            rows = jnp.arange(k)
            cand = jnp.where((col_vals > 0) & (rows >= r), rows, k)
            p = jnp.min(cand)
            found = p < k
            p_safe = jnp.minimum(p, k - 1)
            # swap rows r and p
            row_r = g[r]
            row_p = g[p_safe]
            g = jnp.where(found,
                          g.at[r].set(row_p).at[p_safe].set(row_r), g)
            # eliminate: all rows with 1 in col except row r
            pivot_row = g[r]
            mask = (g[:, col] > 0) & (rows != r)
            g = jnp.where(found & mask[:, None],
                          jnp.mod(g + pivot_row[None], 2), g)
            pivots = jnp.where(found, pivots.at[r].set(col), pivots)
            r = r + found.astype(r.dtype)
            return g, pivots, r

        pivots0 = jnp.zeros((k,), jnp.int32)
        g, pivots, r = jax.lax.fori_loop(
            0, n, body, (g, pivots0, jnp.asarray(0, jnp.int32)))
        return g, pivots

    def _decode_one(self, llr):
        """OSD for a single codeword; llr [n] logits."""
        n = self._n
        # reliability sorting (most reliable first)
        order = jnp.argsort(-jnp.abs(llr))
        llr_p = jnp.take(llr, order)
        g_p = jnp.take(jnp.asarray(self._gm, llr.dtype), order, axis=1)
        g_red, pivots = self._gaussian_eliminate(g_p)
        # hard decisions at the pivot (most reliable basis) positions
        d = (jnp.take(llr_p, pivots) > 0).astype(llr.dtype)
        # candidates: flip <= t basis bits
        pat = jnp.asarray(self._patterns, llr.dtype)  # [P, k]
        u_cand = jnp.mod(d[None, :] + pat, 2)  # [P, k]
        c_cand = jnp.mod(jnp.matmul(u_cand, g_red), 2)  # [P, n]
        # correlation metric in the permuted domain
        metric = jnp.sum((2 * c_cand - 1) * llr_p[None, :], axis=-1)
        best = jnp.argmax(metric)
        c_best_p = c_cand[best]
        # unpermute
        inv = jnp.argsort(order)
        return jnp.take(c_best_p, inv)

    def call(self, llr_ch, /):
        llr = jnp.asarray(llr_ch, self.rdtype)
        in_shape = llr.shape
        flat = jnp.reshape(llr, (-1, self._n))
        c_hat = jax.vmap(self._decode_one)(flat)
        return jnp.reshape(c_hat.astype(self.rdtype), in_shape)
