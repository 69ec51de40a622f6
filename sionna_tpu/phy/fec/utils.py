"""FEC utilities (reference: src/sionna/phy/fec/utils.py; fresh
implementations). Host-side NumPy for code algebra / IO; JAX for the
LLR sources and metrics."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..block import Block
from ..config import config

__all__ = ["GaussianPriorSource", "llr2mi", "j_fun", "j_fun_inv",
           "plot_trajectory", "plot_exit_chart", "get_exit_analytic",
           "load_parity_check_examples", "bin2int", "int2bin",
           "bin2int_jnp", "int2bin_jnp", "bin2int_tf", "int2bin_tf",
           "alist2mat", "load_alist", "make_systematic", "gm2pcm",
           "pcm2gm", "verify_gm_pcm", "generate_reg_ldpc", "int_mod_2"]

_CODES_DIR = os.path.join(os.path.dirname(__file__), "ldpc", "codes")


class GaussianPriorSource(Block):
    """Generates synthetic LLRs as if the all-zero codeword was
    transmitted over a Bi-AWGN channel (reference fec/utils.py:16).

    Call with (output_shape, no=None, mi=None[, key]).
    """

    def call(self, output_shape, no=None, mi=None, key=None):
        if key is None:
            key = config.next_key()
        shape = tuple(int(s) for s in np.asarray(output_shape).reshape(
            -1))
        if no is None:
            if mi is None:
                raise ValueError("Either no or mi must be provided.")
            mi = jnp.clip(jnp.asarray(mi, self.rdtype), 1e-7, 1.)
            mu_llr = j_fun_inv(mi)
            sigma_llr = jnp.sqrt(2 * mu_llr)
        else:
            no = jnp.maximum(jnp.asarray(no, self.rdtype), 1e-7)
            sigma_llr = jnp.sqrt(4 / no)
            mu_llr = sigma_llr ** 2 / 2
        return (-mu_llr + sigma_llr
                * jax.random.normal(key, shape, self.rdtype))


def llr2mi(llr, s=None, reduce_dims=True):
    """Empirical mutual information from LLRs
    (reference fec/utils.py:116)."""
    llr = jnp.asarray(llr)
    if s is not None:
        llr = llr * jnp.asarray(s, llr.dtype)
    # I ~ 1 - E[log2(1 + e^{-L})] for classic all-zero LLRs (L > 0
    # for correct decisions)
    mi = 1 - jnp.log2(1 + jnp.exp(-jnp.clip(llr, -20., 20.)))
    if reduce_dims:
        return jnp.mean(mi)
    return jnp.mean(mi, axis=-1)


def j_fun(mu):
    """Brannstrom J-function approximation
    (reference fec/utils.py:184)."""
    mu = jnp.clip(jnp.asarray(mu), 1e-10, 1000)
    h1, h2, h3 = 0.3073, 0.8935, 1.1064
    return (1 - 2 ** (-h1 * (2 * mu) ** h2)) ** h3


def j_fun_inv(mi):
    """Inverse J-function (reference fec/utils.py:227)."""
    mi = jnp.clip(jnp.asarray(mi), 1e-10, 1.)
    h1, h2, h3 = 0.3073, 0.8935, 1.1064
    mu = 0.5 * ((-1 / h1) * jnp.log2(1 - mi ** (1 / h3))) ** (1 / h2)
    return jnp.minimum(mu, 20)


def plot_trajectory(plot, mi_v, mi_c, ebno=None):
    """Adds a decoding trajectory to an EXIT chart
    (reference fec/utils.py:269)."""
    assert len(mi_v) == len(mi_c)
    x = np.repeat(np.asarray(mi_v), 2)[:-1]
    y = np.concatenate([[0], np.repeat(np.asarray(mi_c), 2)[:-1]])
    label = f"Trajectory @ {ebno} dB" if ebno is not None \
        else "Trajectory"
    plot.plot(x, y, "-", linewidth=2, label=label)
    plot.legend()


def plot_exit_chart(mi_a=None, mi_ev=None, mi_ec=None,
                    title="EXIT-Chart"):
    """Plots EXIT curves (reference fec/utils.py:319)."""
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(8, 8))
    plt.title(title)
    plt.xlabel("I_a (VND) / I_e (CND)")
    plt.ylabel("I_e (VND) / I_a (CND)")
    plt.grid(True)
    if mi_a is not None and mi_ev is not None:
        plt.plot(np.asarray(mi_a), np.asarray(mi_ev),
                 label="VND")
    if mi_a is not None and mi_ec is not None:
        plt.plot(np.asarray(mi_ec), np.asarray(mi_a),
                 label="CND")
    plt.legend()
    return plt


def get_exit_analytic(pcm, ebno_db):
    """Analytic EXIT curves of a (regular-ish) LDPC parity-check
    matrix (reference fec/utils.py:378)."""
    pcm = np.asarray(pcm)
    n = pcm.shape[1]
    k = n - pcm.shape[0]
    coderate = k / n
    ebno = 10 ** (ebno_db / 10)
    snr = ebno * coderate
    noise_var = 1 / (2 * snr)
    sigma_llr = np.sqrt(4 / noise_var)
    mu_llr = sigma_llr ** 2 / 2

    c_max = int(np.max(np.sum(pcm, axis=1)) + 1)
    v_max = int(np.max(np.sum(pcm, axis=0)) + 1)
    c = np.histogram(np.sum(pcm, axis=1), bins=c_max,
                     range=(0, c_max))[0]
    v = np.histogram(np.sum(pcm, axis=0), bins=v_max,
                     range=(0, v_max))[0]
    r = np.zeros(c_max)
    for i in range(1, c_max):
        r[i] = (i - 1) * c[i]
    r = r / np.sum(r)
    l = np.zeros(v_max)
    for i in range(1, v_max):
        l[i] = (i - 1) * v[i]
    l = l / np.sum(l)
    mi_a = np.arange(0.002, 0.998, 0.001)
    mi_ec = np.zeros_like(mi_a)
    for i in range(1, c_max):
        mi_ec += r[i] * np.asarray(
            j_fun((i - 1.) * np.asarray(j_fun_inv(1 - mi_a))))
    mi_ec = 1 - mi_ec
    mi_ev = np.zeros_like(mi_a)
    for i in range(1, v_max):
        mi_ev += l[i] * np.asarray(
            j_fun(mu_llr + (i - 1.) * np.asarray(j_fun_inv(mi_a))))
    return mi_a, mi_ev, mi_ec


def load_parity_check_examples(pcm_id, verbose=False):
    """Loads example parity-check matrices (Hamming, BCH, LDPC)
    (reference fec/utils.py:478)."""
    pcms = np.load(os.path.join(_CODES_DIR, "example_codes.npy"),
                   allow_pickle=True)
    pcm = np.array(pcms[pcm_id])
    n = int(pcm.shape[1])
    k = int(n - pcm.shape[0])
    coderate = k / n
    if verbose:
        print(f"\nn: {n}, k: {k}, coderate: {coderate:.3f}")
    return pcm, k, n, coderate


def bin2int(arr):
    """MSB-first binary iterable -> int (reference fec/utils.py:532)."""
    out = 0
    for b in arr:
        out = (out << 1) | int(b)
    return out


def int2bin(num, length):
    """int -> MSB-first binary list of given length
    (reference fec/utils.py:580)."""
    if num < 0 or length < 0:
        raise ValueError("num and length must be non-negative.")
    return [int(b) for b in np.binary_repr(num, max(length, 1))
            ][-length:] if length > 0 else []


def bin2int_jnp(arr, axis=-1):
    """Tensor variant of :func:`bin2int`: MSB-first bits along
    ``axis`` -> integers (reference bin2int_tf, fec/utils.py:552)."""
    arr = jnp.asarray(arr, jnp.int32)
    length = arr.shape[axis]
    weights = 2 ** jnp.arange(length - 1, -1, -1, dtype=jnp.int32)
    return jnp.tensordot(jnp.moveaxis(arr, axis, -1), weights,
                         axes=1)


def int2bin_jnp(ints, length):
    """Tensor variant of :func:`int2bin`: integers -> MSB-first bits
    appended as a trailing axis of size ``length`` (reference
    int2bin_tf, fec/utils.py:616)."""
    ints = jnp.asarray(ints, jnp.int32)
    shifts = jnp.arange(length - 1, -1, -1, dtype=jnp.int32)
    return (ints[..., None] >> shifts) & 1


# Migration aliases carrying the reference's TF-era names so imports
# port over unchanged (reference fec/utils.py:552,616)
bin2int_tf = bin2int_jnp
int2bin_tf = int2bin_jnp


def load_alist(path):
    """Reads an .alist file into a nested list
    (reference fec/utils.py:764)."""
    alist = []
    with open(path) as f:
        for line in f:
            alist.append([int(x) for x in line.split()])
    return alist


def alist2mat(alist, verbose=True):
    """alist (nested list) -> (pcm, k, n, coderate)
    (reference fec/utils.py:650)."""
    n, m = alist[0]
    pcm = np.zeros((m, n), int)
    # rows 4..4+n-1: per-VN list of CN indices (1-based)
    for col, cn_list in enumerate(alist[4:4 + n]):
        for cn in cn_list:
            if cn > 0:
                pcm[cn - 1, col] = 1
    k = n - m
    coderate = k / n
    if verbose:
        print(f"Loaded alist code with n={n}, k={k}")
    return pcm, k, n, coderate


def make_systematic(mat, is_pcm=False):
    """Gaussian elimination over GF(2) to bring ``mat`` to systematic
    form (reference fec/utils.py:797). Returns (mat_sys,
    column_permutation)."""
    m = np.array(mat) % 2
    num_rows, num_cols = m.shape
    perm = np.arange(num_cols)
    row = 0
    for col in range(num_cols):
        if row >= num_rows:
            break
        # find pivot
        pivot_rows = np.where(m[row:, col] == 1)[0]
        if len(pivot_rows) == 0:
            continue
        pivot = pivot_rows[0] + row
        if pivot != row:
            m[[row, pivot]] = m[[pivot, row]]
        # eliminate
        for r in range(num_rows):
            if r != row and m[r, col] == 1:
                m[r] = (m[r] + m[row]) % 2
        row += 1
    # move identity columns to the front (gm) or back (pcm)
    id_cols = []
    for r in range(num_rows):
        ones = np.where(m[r] == 1)[0]
        lead = None
        for c in ones:
            if np.sum(m[:, c]) == 1:
                lead = c
                break
        if lead is None:
            raise ValueError("Matrix is rank deficient.")
        id_cols.append(lead)
    other = [c for c in range(num_cols) if c not in id_cols]
    if is_pcm:
        perm = np.array(other + id_cols)
    else:
        perm = np.array(id_cols + other)
    return m[:, perm], perm


def gm2pcm(gm, verify_results=True):
    """Generator matrix -> parity-check matrix
    (reference fec/utils.py:908)."""
    gm = np.array(gm) % 2
    k, n = gm.shape
    gm_sys, perm = make_systematic(gm, is_pcm=False)
    p = gm_sys[:, k:]  # [k, n-k]
    pcm_sys = np.concatenate([p.T, np.eye(n - k, dtype=int)], axis=1)
    # undo permutation
    inv_perm = np.argsort(perm)
    pcm = pcm_sys[:, inv_perm]
    if verify_results and not verify_gm_pcm(gm, pcm):
        raise ArithmeticError("Invalid pcm generated.")
    return pcm


def pcm2gm(pcm, verify_results=True):
    """Parity-check matrix -> generator matrix
    (reference fec/utils.py:986)."""
    pcm = np.array(pcm) % 2
    m, n = pcm.shape
    k = n - m
    pcm_sys, perm = make_systematic(pcm, is_pcm=True)
    p = pcm_sys[:, :k]  # [m, k]
    gm_sys = np.concatenate([np.eye(k, dtype=int), p.T], axis=1)
    inv_perm = np.argsort(perm)
    gm = gm_sys[:, inv_perm]
    if verify_results and not verify_gm_pcm(gm, pcm):
        raise ArithmeticError("Invalid gm generated.")
    return gm


def verify_gm_pcm(gm, pcm):
    """Checks H G^T = 0 over GF(2) (reference fec/utils.py:1062)."""
    s = np.mod(np.matmul(np.asarray(pcm), np.asarray(gm).T), 2)
    return np.sum(s) == 0


def generate_reg_ldpc(v, c, n, allow_flex_len=True, verbose=True):
    """Random regular (v, c) LDPC parity-check matrix
    (reference fec/utils.py:1115). Returns (pcm, k, n, coderate)."""
    if allow_flex_len:
        # adjust n so that n*v is a multiple of c
        while (n * v) % c != 0:
            n += 1
    num_edges = n * v
    m = num_edges // c
    rng = config.np_rng
    # permutation-based edge assignment
    edges = np.repeat(np.arange(n), v)
    sockets = np.repeat(np.arange(m), c)
    perm = rng.permutation(num_edges)
    pcm = np.zeros((m, n), int)
    for e in range(num_edges):
        pcm[sockets[perm[e]], edges[e]] ^= 1
    k = n - m
    if verbose:
        print(f"Generated regular ({v},{c}) LDPC with n={n}, k={k}")
    return pcm, k, n, k / n


def int_mod_2(x):
    """Efficient elementwise mod-2 for float tensors
    (reference fec/utils.py:1236)."""
    x = jnp.asarray(x)
    return jnp.mod(jnp.round(x), 2)
