"""Polar code construction utilities (reference:
src/sionna/phy/fec/polar/utils.py:13,114,148,217; fresh
implementations). Host-side NumPy (code construction is offline)."""

import os

import numpy as np
from scipy.special import comb

__all__ = ["generate_5g_ranking", "generate_polar_transform_mat",
           "generate_rm_code", "generate_dense_polar"]

_CODES_DIR = os.path.join(os.path.dirname(__file__), "codes")
_CH_ORDER_CACHE = {}


def _load_ch_order():
    if "t" not in _CH_ORDER_CACHE:
        _CH_ORDER_CACHE["t"] = np.genfromtxt(
            os.path.join(_CODES_DIR, "polar_5G.csv"),
            delimiter=";").astype(int)
    return _CH_ORDER_CACHE["t"]


def generate_5g_ranking(k, n, sort=True):
    """Frozen/info positions of the 5G polar code (TS 38.212 Tab.
    5.3.1.2-1). Returns (frozen_pos, info_pos)."""
    if not isinstance(k, (int, np.integer)):
        raise TypeError("k must be integer.")
    if not isinstance(n, (int, np.integer)):
        raise TypeError("n must be integer.")
    if k < 0:
        raise ValueError("k cannot be negative.")
    if k > 1024 or n > 1024:
        raise ValueError("k and n cannot be larger than 1024.")
    if n < 32:
        raise ValueError("n must be >=32.")
    if n < k:
        raise ValueError("Invalid coderate (>1).")
    if np.log2(n) != int(np.log2(n)):
        raise ValueError("n must be a power of 2.")

    ch_order = _load_ch_order()
    # channels with index < n, ordered by reliability
    ind = np.argsort(ch_order[:, 1])
    ch_sorted = ch_order[ind][:n]
    ind_n = np.argsort(ch_sorted[:, 0])
    ch_n = ch_sorted[ind_n]
    frozen_pos = ch_n[:n - k, 1].astype(int)
    info_pos = ch_n[n - k:, 1].astype(int)
    if sort:
        frozen_pos = np.sort(frozen_pos)
        info_pos = np.sort(info_pos)
    return frozen_pos, info_pos


def generate_polar_transform_mat(n_lift):
    """Kronecker power of [[1, 0], [1, 1]] (reference utils.py:114)."""
    if n_lift >= 12:
        raise ValueError("Warning: the resulting matrix is too large.")
    gm = np.array([[1, 0], [1, 1]])
    gm_l = np.array([[1]])
    for _ in range(n_lift):
        gm_l = np.kron(gm_l, gm)
    return gm_l


def generate_rm_code(r, m):
    """Reed-Muller (r, m) frozen positions (reference utils.py:148).
    Returns (frozen_pos, info_pos, n, k, d_min)."""
    if r > m:
        raise ValueError("r cannot be larger than m.")
    if r < 0 or m < 0:
        raise ValueError("r and m must be positive.")
    n = 2 ** m
    d_min = 2 ** (m - r)
    k = int(sum(comb(m, i) for i in range(r + 1)))
    w = np.array([bin(i).count("1") for i in range(n)])
    frozen_vec = w < m - r
    frozen_pos = np.arange(n)[frozen_vec]
    info_pos = np.arange(n)[~frozen_vec]
    if len(info_pos) != k:
        raise ValueError("Error: resulting k is inconsistent.")
    return frozen_pos, info_pos, n, k, d_min


def generate_dense_polar(frozen_pos, n, verbose=True):
    """Naive (dense) generator and parity-check matrix of a polar code
    (reference utils.py:217). Returns (pcm, gm)."""
    frozen_pos = np.asarray(frozen_pos)
    n = int(n)
    if np.log2(n) != int(np.log2(n)):
        raise ValueError("n must be a power of 2.")
    k = n - len(frozen_pos)
    info_pos = np.setdiff1d(np.arange(n), frozen_pos)
    gm_mat = generate_polar_transform_mat(int(np.log2(n)))
    gm = gm_mat[info_pos, :]
    pcm = np.transpose(gm_mat[:, frozen_pos])
    s = np.mod(pcm @ gm.T, 2)
    if np.sum(s) != 0:
        raise ArithmeticError("Non-zero syndrome for H*G'.")
    if verbose:
        print(f"Generated dense polar code matrices with k={k}, n={n}")
    return pcm, gm
