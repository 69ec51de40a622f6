"""Interleaver blocks (reference: src/sionna/phy/fec/interleaving.py:12,
197,500,598; fresh JAX implementations).

All permutations are precomputed host-side (static shapes) and applied
as a single XLA gather along the target axis.
"""

import os

import numpy as np

import jax.numpy as jnp

from ..block import Block
from ..config import config

__all__ = ["RowColumnInterleaver", "RandomInterleaver", "Deinterleaver",
           "Turbo3GPPInterleaver"]


class RowColumnInterleaver(Block):
    """Interleaves by writing row-wise into a matrix with ``row_depth``
    columns and reading column-wise (filler positions removed)."""

    def __init__(self, row_depth, axis=-1, inverse=False, precision=None,
                 **kwargs):
        super().__init__(precision=precision, **kwargs)
        if not isinstance(row_depth, int):
            raise TypeError("row_depth must be int")
        self._row_depth = row_depth
        self._axis = axis
        self._inverse = bool(inverse)
        self._perm_cache = {}
        self._keep_state = True

    @property
    def axis(self):
        return self._axis

    @property
    def row_depth(self):
        return self._row_depth

    @property
    def keep_state(self):
        return self._keep_state

    def _perms(self, n_seq):
        if n_seq not in self._perm_cache:
            n = int(np.ceil(n_seq / self._row_depth) * self._row_depth)
            nb_rows = n // self._row_depth
            ind = np.arange(n).reshape(nb_rows, -1).T.reshape(-1)
            perm = ind[ind < n_seq]
            perm_inv = np.argsort(perm)
            self._perm_cache[n_seq] = (perm, perm_inv)
        return self._perm_cache[n_seq]

    @property
    def perm_seq(self):
        if self._perm_cache:
            return next(iter(self._perm_cache.values()))[0]
        return None

    @property
    def perm_seq_inv(self):
        if self._perm_cache:
            return next(iter(self._perm_cache.values()))[1]
        return None

    def call(self, x, /, *, inverse=None, **kwargs):
        x = jnp.asarray(x)
        n_seq = x.shape[self._axis]
        if inverse is None:
            inverse = self._inverse
        rd = self._row_depth
        axis = self._axis % x.ndim
        if n_seq % rd == 0 and axis == x.ndim - 1:
            # TPU fast path: with no filler positions the row-column
            # permutation is exactly a [rows, depth] transpose — a
            # strided copy instead of a 1-element-per-row gather
            nb_rows = n_seq // rd
            if inverse:
                y = x.reshape(x.shape[:-1] + (rd, nb_rows))
                y = jnp.swapaxes(y, -1, -2)
            else:
                y = x.reshape(x.shape[:-1] + (nb_rows, rd))
                y = jnp.swapaxes(y, -1, -2)
            return y.reshape(x.shape)
        perm, perm_inv = self._perms(n_seq)
        idx = perm_inv if inverse else perm
        return jnp.take(x, idx, axis=self._axis)


class RandomInterleaver(Block):
    """Stateless pseudo-random interleaver: the permutation is a pure
    function of the seed (init- or call-provided).

    ``keep_batch_constant=True`` (default) applies one permutation to
    the whole batch.
    """

    def __init__(self, seed=None, keep_batch_constant=True, inverse=False,
                 keep_state=True, axis=-1, precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        if seed is not None and not isinstance(seed, int):
            raise TypeError("seed must be int.")
        self._seed = seed if seed is not None else int(
            config.np_rng.integers(0, 2**31 - 1))
        self._keep_batch_constant = bool(keep_batch_constant)
        self._inverse = bool(inverse)
        self._keep_state = bool(keep_state)
        self._axis = axis
        self._call_count = 0
        self._perm_cache = {}

    @property
    def seed(self):
        return self._seed

    @property
    def axis(self):
        return self._axis

    @property
    def keep_state(self):
        return self._keep_state

    def _perms(self, n, seed):
        cache_key = (n, seed)
        if cache_key not in self._perm_cache:
            rng = np.random.default_rng(seed)
            perm = rng.permutation(n)
            self._perm_cache[cache_key] = (perm, np.argsort(perm))
        return self._perm_cache[cache_key]

    def find_s_min(self, seed, seq_length, s_min_stop=0):
        """Spread factor S = min |pi(i) - pi(i+1)| of the permutation
        for ``seed`` (reference interleaving.py:315)."""
        perm = np.asarray(self._perms(int(seq_length), int(seed))[0])
        s = np.abs(np.diff(perm)).min()
        return int(s)

    def call(self, x, /, *, seed=None, inverse=None):
        x = jnp.asarray(x)
        n = x.shape[self._axis]
        if seed is not None:
            s = int(seed)
        elif self._keep_state:
            s = self._seed
        else:
            self._call_count += 1
            s = self._seed + 0x9E3779B9 * self._call_count
        perm, perm_inv = self._perms(n, s)
        if inverse is None:
            inverse = self._inverse
        idx = perm_inv if inverse else perm
        return jnp.take(x, idx, axis=self._axis)


class Deinterleaver(Block):
    """Inverse of an associated interleaver
    (reference interleaving.py:500)."""

    def __init__(self, interleaver, precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        if not isinstance(interleaver, (RowColumnInterleaver,
                                        RandomInterleaver,
                                        Turbo3GPPInterleaver)):
            raise TypeError("interleaver is not a valid interleaver type.")
        self._interleaver = interleaver

    @property
    def interleaver(self):
        return self._interleaver

    def call(self, x, /, *, seed=None):
        if isinstance(self._interleaver, (RowColumnInterleaver,
                                          Turbo3GPPInterleaver)):
            return self._interleaver(x, inverse=True)
        return self._interleaver(x, seed=seed, inverse=True)


class Turbo3GPPInterleaver(Block):
    """3GPP LTE turbo-code interleaver (TS 36.212):
    pi(i) = (f1*i + f2*i^2) mod K with (f1, f2) from the standard's
    table; zero-padding to the next supported K when needed
    (reference interleaving.py:598)."""

    def __init__(self, inverse=False, axis=-1, precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        if not isinstance(axis, int):
            raise TypeError("axis must be int.")
        self._axis = axis
        self._inverse = bool(inverse)
        self._keep_state = True
        self._perm_cache = {}

        coeffs_path = os.path.join(os.path.dirname(__file__), "turbo",
                                   "coeffs", "turbo_coeffs.csv")
        table = np.genfromtxt(coeffs_path, delimiter=",")[1:]
        # columns: idx, K, f1, f2
        self._coeffs = {int(r[1]): (int(r[2]), int(r[3])) for r in table}
        self.frame_size = None

    @property
    def axis(self):
        return self._axis

    def _perms(self, frame_size):
        if frame_size not in self._perm_cache:
            if frame_size > 6144:
                raise ValueError("Interleaver length must be <= 6144.")
            ks = sorted(self._coeffs)
            k = next(kk for kk in ks if kk >= frame_size)
            f1, f2 = self._coeffs[k]
            i = np.arange(k, dtype=np.int64)
            perm_full = (f1 * i + f2 * i * i) % k
            # shorten to frame_size: keep only positions < frame_size
            perm = perm_full[perm_full < frame_size]
            self._perm_cache[frame_size] = (perm, np.argsort(perm))
        return self._perm_cache[frame_size]

    def call(self, x, /, *, inverse=None, **kwargs):
        x = jnp.asarray(x)
        self.frame_size = x.shape[self._axis]
        perm, perm_inv = self._perms(self.frame_size)
        if inverse is None:
            inverse = self._inverse
        idx = perm_inv if inverse else perm
        return jnp.take(x, idx, axis=self._axis)
