"""Polar decoding: SC, SCL, BP, and the 5G wrapper (reference:
src/sionna/phy/fec/polar/decoding.py:15,266,1440,1774; fresh JAX
implementations).

TPU design: the reference unrolls the SC tree recursively in Python
(graph size O(n)) and falls back to a NumPy decoder for large SCL
codes (decoding.py:426). Here SC/SCL run as a single
``lax.fori_loop`` over bit indices with per-level fixed-shape LLR /
partial-sum arrays and masked level updates - O(n log n) work, a
compiled graph of size O(log n), fully batched (and list-parallel for
SCL, with ``lax.top_k`` path pruning). No host fallback at any size.
"""

import numbers
import warnings

import numpy as np

import jax
import jax.numpy as jnp

from ...block import Block
from ..crc import CRCEncoder, CRCDecoder
from .encoding import Polar5GEncoder

__all__ = ["PolarSCDecoder", "PolarSCLDecoder", "PolarBPDecoder",
           "Polar5GDecoder"]

_LLR_MAX = 30.0


def _boxplus(x, y):
    """Exact check-node op, matching the reference's formula
    (decoding.py:_cn_op_tf) with +-30 clipping."""
    x = jnp.clip(x, -_LLR_MAX, _LLR_MAX)
    y = jnp.clip(y, -_LLR_MAX, _LLR_MAX)
    return (jnp.log(1 + jnp.exp(x + y))
            - jnp.log(jnp.exp(x) + jnp.exp(y)))


def _g_op(x, y, u):
    return (1 - 2 * u) * x + y


def _sc_stages(n):
    return int(np.log2(n))


def _make_sc_body(n, frozen_mask_np, list_size=None):
    """Builds the per-bit fori_loop body for SC (list_size=None) or
    SCL decoding. State:
      Ls   : tuple of arrays [2^s] (or [list, 2^s]) for s=0..m
      Bls  : tuple of arrays [2^s] (or [list, 2^s]) for s=0..m-1
      u    : [n] (or [list, n]) decisions
      pm   : [list] path metrics (SCL only)
    """
    m = _sc_stages(n)
    frozen_mask = jnp.asarray(frozen_mask_np, jnp.float32)

    def propagate_llrs(i, Ls, Bls):
        # number of trailing zeros of i (l); for i==0 use m-1 so that
        # lp1 = m (full descent)
        l = jnp.where(
            i == 0, m - 1,
            jnp.sum(jnp.cumprod(
                (jnp.bitwise_and(
                    jnp.right_shift(i, jnp.arange(m)), 1) == 0
                 ).astype(jnp.int32))))
        lp1 = l + 1
        Ls = list(Ls)
        for s in range(m, 0, -1):
            half = 1 << (s - 1)
            a = Ls[s][..., :half]
            b = Ls[s][..., half:]
            use_g = jnp.bitwise_and(jnp.right_shift(i, s - 1), 1) == 1
            f_val = _boxplus(a, b)
            g_val = _g_op(a, b, Bls[s - 1])
            new = jnp.where(use_g, g_val, f_val)
            active = s <= lp1
            Ls[s - 1] = jnp.where(active, new, Ls[s - 1])
        return tuple(Ls)

    def update_partial_sums(i, Bls, cur):
        """cur: decision bits of the just-completed node at level 0
        ([..., 1]). Stores/combines partial sums level by level."""
        Bls = list(Bls)
        for s in range(m):
            period = 1 << (s + 1)
            store = jnp.mod(i, period) == ((1 << s) - 1)
            Bls[s] = jnp.where(store, cur, Bls[s])
            combined = jnp.concatenate(
                [jnp.mod(Bls[s] + cur, 2), cur], axis=-1)
            cur = combined
        return tuple(Bls)

    if list_size is None:
        def body(i, state):
            Ls, Bls, u = state
            Ls = propagate_llrs(i, Ls, Bls)
            llr0 = Ls[0][..., 0]
            frozen_i = jnp.take(frozen_mask, i)
            u_i = jnp.where(frozen_i > 0, 0.,
                            (llr0 < 0).astype(jnp.float32))
            u = u.at[..., i].set(u_i)
            Bls = update_partial_sums(i, Bls, u_i[..., None])
            return Ls, Bls, u
        return body

    # SCL body: arrays have leading list dim
    def body(i, state):
        Ls, Bls, u, pm = state
        Ls = propagate_llrs(i, Ls, Bls)
        llr0 = Ls[0][..., 0]  # [list]
        frozen_i = jnp.take(frozen_mask, i)

        # candidate decisions and path metrics
        # pm update: pm + softplus(-(1-2u) * llr)
        pm0 = pm + jax.nn.softplus(-jnp.clip(llr0, -_LLR_MAX,
                                             _LLR_MAX))
        pm1 = pm + jax.nn.softplus(jnp.clip(llr0, -_LLR_MAX,
                                            _LLR_MAX))

        def frozen_case():
            return (jnp.zeros_like(llr0), pm0,
                    jnp.arange(list_size, dtype=jnp.int32))

        def info_case():
            # branch: 2L candidates [u=0 paths ; u=1 paths]
            pm_all = jnp.concatenate([pm0, pm1])
            neg_pm, idx = jax.lax.top_k(-pm_all, list_size)
            parents = jnp.mod(idx, list_size).astype(jnp.int32)
            decisions = (idx >= list_size).astype(jnp.float32)
            return decisions, -neg_pm, parents

        u_i, pm, parents = jax.lax.cond(frozen_i > 0, frozen_case,
                                        info_case)
        # reorder all per-path state by parent index
        Ls = tuple(jnp.take(a, parents, axis=0) for a in Ls)
        Bls = tuple(jnp.take(a, parents, axis=0) for a in Bls)
        u = jnp.take(u, parents, axis=0)
        u = u.at[..., i].set(u_i)
        Bls = update_partial_sums(i, Bls, u_i[..., None])
        return Ls, Bls, u, pm

    return body


def _sc_decode_single(llr_ch, frozen_mask_np, n):
    """SC decode one codeword; llr_ch [n] in classic convention.
    Returns hard decisions u_hat [n]."""
    m = _sc_stages(n)
    body = _make_sc_body(n, frozen_mask_np)
    Ls = tuple(jnp.zeros((1 << s,), llr_ch.dtype) for s in range(m)) \
        + (llr_ch,)
    Bls = tuple(jnp.zeros((1 << s,), llr_ch.dtype) for s in range(m))
    u = jnp.zeros((n,), jnp.float32)
    _, _, u = jax.lax.fori_loop(0, n, body, (Ls, Bls, u))
    return u


def _scl_decode_single(llr_ch, frozen_mask_np, n, list_size):
    """SCL decode one codeword. Returns (u_hat [list, n], pm [list])
    sorted so the best path can be selected by the caller."""
    m = _sc_stages(n)
    body = _make_sc_body(n, frozen_mask_np, list_size)
    # all paths start identical; penalize duplicates so only path 0
    # is initially active
    Ls = tuple(jnp.tile(jnp.zeros((1, 1 << s), llr_ch.dtype),
                        (list_size, 1)) for s in range(m)) \
        + (jnp.tile(llr_ch[None], (list_size, 1)),)
    Bls = tuple(jnp.zeros((list_size, 1 << s), llr_ch.dtype)
                for s in range(m))
    u = jnp.zeros((list_size, n), jnp.float32)
    pm = jnp.where(jnp.arange(list_size) == 0, 0., 1e9).astype(
        llr_ch.dtype)
    _, _, u, pm = jax.lax.fori_loop(0, n, body, (Ls, Bls, u, pm))
    return u, pm


# ------------------------------------------------------------------ #
# Fast SSC / SSCL: trace-time tree recursion with node shortcuts.
#
# The decoding tree is pruned host-side (the frozen set is static):
# rate-0 (all-frozen), repetition, and - for SC - rate-1 and SPC
# subtrees are decoded in one vectorized step instead of descending
# bit by bit.  Rate-0/rep shortcuts use the node-level exact path
# metrics of Hashemi et al. (same equations as the reference's
# fast-SCL, decoding.py:525,547), so the surviving list is the same
# as per-bit decoding.  The recursion unrolls at trace time into a
# static XLA graph; everything is batch-native ([batch, list, width]
# tensors), removing the per-bit fori_loop and its masked full-depth
# LLR propagation.
# ------------------------------------------------------------------ #

def _polar_transform_bits(x):
    """u = x F^{(x)m} over GF(2) (involutive); x [..., w] in {0,1}."""
    w = x.shape[-1]
    d = w // 2
    while d >= 1:
        xr = jnp.reshape(x, x.shape[:-1] + (w // (2 * d), 2, d))
        left = jnp.mod(xr[..., 0, :] + xr[..., 1, :], 2)
        x = jnp.reshape(
            jnp.concatenate([left[..., None, :], xr[..., 1:2, :]],
                            axis=-2), x.shape)
        d //= 2
    return x


def _fast_sc_decode_batch(llr_ch, frozen_mask_np, n,
                          use_spc=False):
    """Batched fast-SSC decode. llr_ch [B, n] classic convention.
    Returns hard u decisions [B, n] - identical to bit-by-bit SC.

    Rate-0/rate-1/repetition shortcuts are exact for any check-node f
    with sign(f(a,b)) = sign(a)sign(b), so for the exact boxplus used
    here.  The classic SPC shortcut (hard decisions + parity flip at
    the least-reliable bit) is exact only for MIN-SUM f; under exact
    boxplus it changes ~1% of decisions, so it is off by default and
    SPC subtrees descend normally."""
    frozen = np.asarray(frozen_mask_np) > 0
    dtype = llr_ch.dtype

    def decode(s, lo, llr):
        w = 1 << s
        sub = frozen[lo:lo + w]
        if sub.all():                      # rate-0
            return jnp.zeros_like(llr)
        if not sub.any():                  # rate-1
            return (llr < 0).astype(dtype)
        if sub[:-1].all() and not sub[-1]:  # repetition
            bit = (jnp.sum(llr, -1, keepdims=True) < 0).astype(dtype)
            return jnp.broadcast_to(bit, llr.shape)
        if use_spc and sub[0] and not sub[1:].any():  # SPC
            hard = (llr < 0).astype(dtype)
            parity = jnp.mod(jnp.sum(hard, -1, keepdims=True), 2)
            amin = jnp.argmin(jnp.abs(llr), -1)
            flip = jax.nn.one_hot(amin, w, dtype=dtype) * parity
            return jnp.mod(hard + flip, 2)
        half = w // 2
        a, b = llr[..., :half], llr[..., half:]
        bl = decode(s - 1, lo, _boxplus(a, b))
        br = decode(s - 1, lo + half, _g_op(a, b, bl))
        return jnp.concatenate([jnp.mod(bl + br, 2), br], axis=-1)

    beta = decode(_sc_stages(n), 0, llr_ch)
    return _polar_transform_bits(beta)


def _fast_scl_decode_batch(llr_ch, frozen_mask_np, n, list_size,
                           use_fast=True, use_spc=False):
    """Batched fast-SSCL decode (rate-0 / repetition / rate-1 pruning
    with exact node path metrics; the reference's use_fast_scl prunes
    rate-0/rep only, /root/reference/src/sionna/phy/fec/polar/
    decoding.py:424). llr_ch [B, n] classic convention.
    Returns (u [B, L, n], pm [B, L]).

    Path bookkeeping is LAZY: a fork only composes a per-buffer
    [B, L] parent-index vector (an O(B*L) int gather per live
    buffer); the actual cross-path shuffle of a wide [B, L, w]
    buffer is deferred until that buffer is next READ, at which
    point the composition of all intervening fork selections is
    applied once.  This replaces the former eager scheme (permute
    every live ancestor at every fork, O(sum-of-ancestor-widths)
    per fork) with O(#buffers * B * L) per fork plus one
    materialization per buffer read — the dominant SCL cost on both
    TPU and CPU."""
    m = _sc_stages(n)
    bsz = llr_ch.shape[0]
    lsz = list_size
    dtype = llr_ch.dtype
    frozen = np.asarray(frozen_mask_np) > 0

    state = {
        "pm": jnp.broadcast_to(
            jnp.where(jnp.arange(lsz) == 0, 0., 1e9
                      ).astype(dtype)[None], (bsz, lsz)),
        "llr": {s: jnp.zeros((bsz, lsz, 1 << s), dtype)
                for s in range(m)},
        "bl": {s: jnp.zeros((bsz, lsz, 1 << s), dtype)
               for s in range(m)},
        "bb": {s: jnp.zeros((bsz, lsz, 1 << s), dtype)
               for s in range(m + 1)},
    }
    # pending path-selection MATRIX per buffer (None = identity):
    # pend[kind][s] is a one-hot [B, L, L] selection with
    # pend[b, l, k] = 1 iff list row k of the buffer holds path l's
    # value.  Composition and materialization are einsums — integer
    # gathers over the L-wide lane dimension measurably regress on
    # TPU, one-hot contractions do not.  bb needs no entry: every bb
    # is written after its node's last fork and consumed by the
    # parent before the next fork.
    pend = {"llr": {s: None for s in range(m)},
            "bl": {s: None for s in range(m)}}
    # channel LLRs are identical across paths; never permuted
    root_llr = jnp.broadcast_to(llr_ch[:, None, :], (bsz, lsz, n))

    def clip(x):
        return jnp.clip(x, -_LLR_MAX, _LLR_MAX)

    def compose(old, parents):
        # selection-matrix composition: new path l extends old path
        # parents[l]; one-hot einsums throughout (cross-path integer
        # gathers over the L-wide lane dim measurably regress on TPU)
        oh = jax.nn.one_hot(parents, lsz, dtype=dtype)
        if old is None:
            return oh
        return jnp.einsum('blk,bkj->blj', oh, old)

    def select(x, parents):
        """Eagerly shuffle [B, L, ...] buffer rows by parent index
        (exact: each output row sums exactly one term)."""
        oh = jax.nn.one_hot(parents, lsz, dtype=dtype)
        if x.ndim == 2:
            return jnp.einsum('blk,bk->bl', oh, x)
        return jnp.einsum('blk,bkw->blw', oh, x)

    def fork(pm0, pm1, stage):
        """2L -> L path selection for a fork inside the node at
        ``stage``.  Candidate layout [u=0 paths ; u=1 paths] matches
        the per-bit decoder's info_case for identical tie-breaking.

        Only live buffers track the selection: ancestors re-read
        their own llr (stages > stage) and their left-sibling bits
        (bl, stages >= stage); the forking node's own llr is never
        re-read.  Returns (bits, parents)."""
        pm_all = jnp.concatenate([pm0, pm1], axis=-1)  # [B, 2L]
        # NOTE: measured on TPU (P(1024,512) L=8 b=4096): lax.top_k
        # here costs ~25% of decode time, but a 10-stage bitonic
        # select network is WORSE on both runtime (134 ms vs 106 ms)
        # and compile (522 s vs 100 s) — cross-lane static shuffles
        # don't beat the fused TopK custom call.
        neg, idx = jax.lax.top_k(-pm_all, lsz)
        parents = jnp.mod(idx, lsz)
        bits = (idx >= lsz).astype(dtype)
        state["pm"] = -neg
        oh = jax.nn.one_hot(parents, lsz, dtype=dtype)  # [B, L, L]
        for s2 in range(stage + 1, m):
            p = pend["llr"][s2]
            pend["llr"][s2] = oh if p is None else \
                jnp.einsum('blk,bkj->blj', oh, p)
        for s2 in range(stage, m):
            p = pend["bl"][s2]
            pend["bl"][s2] = oh if p is None else \
                jnp.einsum('blk,bkj->blj', oh, p)
        return bits, parents

    def read(kind, s):
        """Materialize any pending path selection, then read."""
        p = pend[kind][s]
        if p is not None:
            state[kind][s] = jnp.einsum('blk,bkw->blw', p,
                                        state[kind][s])
            pend[kind][s] = None
        return state[kind][s]

    def write(kind, s, value):
        state[kind][s] = value
        pend[kind][s] = None

    def node_llr(s):
        return root_llr if s == m else read("llr", s)

    def decode(s, lo):
        """Decodes the node of width 2^s at bit offset lo; its LLR is
        in state['llr'][s] (root_llr at s==m); leaves the node
        codeword in state['bb'][s]."""
        w = 1 << s
        llr = node_llr(s)
        sub = frozen[lo:lo + w]
        if use_fast and sub.all():         # rate-0 (Hashemi eq. 26)
            state["pm"] = state["pm"] + jnp.sum(
                jax.nn.softplus(-clip(llr)), axis=-1)
            state["bb"][s] = jnp.zeros_like(llr)
            return
        if s == 0:
            l0 = llr[..., 0]
            pm0 = state["pm"] + jax.nn.softplus(-clip(l0))
            if sub[0]:
                state["pm"] = pm0
                state["bb"][0] = jnp.zeros_like(llr)
            else:
                pm1 = state["pm"] + jax.nn.softplus(clip(l0))
                bits, _ = fork(pm0, pm1, 0)
                state["bb"][0] = bits[..., None]
            return
        if use_fast and sub[:-1].all() and not sub[-1]:
            # repetition (Hashemi eq. 31)
            pm0 = state["pm"] + jnp.sum(jax.nn.softplus(-clip(llr)),
                                        axis=-1)
            pm1 = state["pm"] + jnp.sum(jax.nn.softplus(clip(llr)),
                                        axis=-1)
            bits, _ = fork(pm0, pm1, s)
            state["bb"][s] = jnp.broadcast_to(bits[..., None],
                                              (bsz, lsz, w))
            return
        if use_fast and use_spc and s >= 1 and sub[0] \
                and not sub[1:].any():
            # single-parity-check node (Hashemi SSCL-SPC): first bit
            # frozen, rest info -> node codewords are the even-parity
            # vectors.  min(L, w) - 1 forks over the least-reliable
            # positions with a parity-repair flip at the least
            # reliable bit give the NODE-OPTIMAL list (verified
            # identical to brute-force enumeration of all even-parity
            # codewords).  Per-bit SCL is greedy-SUBOPTIMAL inside
            # SPC nodes (it prunes mid-node on partial metrics), so
            # this rule is better-or-equal but NOT bit-identical to
            # the per-bit schedule — hence opt-in (use_spc), keeping
            # the default path reference-exact.
            # Flipping bit i_j toggles the path's parity, so the
            # repair flip at i_0 toggles with per-path state sigma:
            # delta_j = |l_ij| + (1 - 2 sigma) |l_i0|.
            a = jnp.abs(clip(llr))
            h = (llr < 0).astype(dtype)
            tau = min(lsz, w)
            neg_vals, pos = jax.lax.top_k(-a, tau)  # ascending |llr|
            vals = -neg_vals                        # [B, L, tau]
            gamma = jnp.mod(jnp.sum(h, axis=-1), 2)  # [B, L]
            state["pm"] = state["pm"] + jnp.sum(
                jax.nn.softplus(-a), axis=-1) + gamma * vals[..., 0]
            sigma = gamma  # 1 where the i_0 repair flip is active
            if tau == 1:
                # no info forks (w == 1 impossible here; tau==1 means
                # lsz == 1): codeword is h with the repair flip
                flip0 = sigma[..., None] * jax.nn.one_hot(
                    pos[..., 0], w, dtype=dtype)
                state["bb"][s] = jnp.mod(h + flip0, 2)
                return
            local = None
            flips = jnp.zeros((bsz, lsz, tau), dtype)
            eye_tau = jnp.eye(tau, dtype=dtype)
            for j in range(1, tau):
                delta = vals[..., j] + (1 - 2 * sigma) * vals[..., 0]
                bits, parents = fork(state["pm"],
                                     state["pm"] + delta, s)
                vals = select(vals, parents)
                flips = select(flips, parents)
                sigma = select(sigma, parents)
                flips = flips + bits[..., None] * eye_tau[j]
                sigma = jnp.mod(sigma + bits, 2)
                local = compose(local, parents)
            h = jnp.einsum('blk,bkw->blw', local, h)
            pos = jnp.einsum('blk,bkj->blj', local,
                             pos.astype(dtype)).astype(pos.dtype)
            # final repair flip at i_0 rides the flips vector
            flips = flips + sigma[..., None] * eye_tau[0]
            pos_oh = jax.nn.one_hot(pos, w, dtype=dtype)
            flip = jnp.einsum('blj,bljw->blw', flips, pos_oh)
            state["bb"][s] = jnp.mod(h + flip, 2)
            return
        if use_fast and not sub.any():
            # rate-1 (Hashemi thm. 2): forking the min(L-1, w) least
            # reliable bits reproduces the per-bit list exactly.  The
            # hard decision for every bit is charged softplus(-|l|)
            # up front; flipping bit j then costs exactly
            # softplus(|l_j|) - softplus(-|l_j|) = |l_j|, so the PM
            # arithmetic matches the per-bit decoder term for term.
            a = jnp.abs(clip(llr))
            h = (llr < 0).astype(dtype)
            state["pm"] = state["pm"] + jnp.sum(
                jax.nn.softplus(-a), axis=-1)
            nf = min(lsz - 1, w)
            if nf == 0:
                state["bb"][s] = h
                return
            neg_vals, pos = jax.lax.top_k(-a, nf)  # ascending |llr|
            vals = -neg_vals
            # h and pos are only read after the last fork: defer
            # their shuffles through a composed local index.  vals
            # (read every fork) and the flip decisions (accumulated
            # every fork) are narrow [B, L, nf] and shuffled eagerly.
            local = None
            flips = jnp.zeros((bsz, lsz, nf), dtype)
            eye_nf = jnp.eye(nf, dtype=dtype)
            for j in range(nf):
                bits, parents = fork(
                    state["pm"], state["pm"] + vals[..., j], s)
                vals = select(vals, parents)
                flips = select(flips, parents)
                flips = flips + bits[..., None] * eye_nf[j]
                local = compose(local, parents)
            h = jnp.einsum('blk,bkw->blw', local, h)
            pos = jnp.einsum('blk,bkj->blj', local,
                             pos.astype(dtype)).astype(pos.dtype)
            # scatter the flip decisions onto distinct positions:
            # flip[b,l,w] = sum_j flips[b,l,j] * onehot(pos[b,l,j])
            pos_oh = jax.nn.one_hot(pos, w, dtype=dtype)  # [B,L,nf,w]
            flip = jnp.einsum('blj,bljw->blw', flips, pos_oh)
            state["bb"][s] = jnp.mod(h + flip, 2)
            return
        half = w // 2
        llr = node_llr(s)
        write("llr", s - 1, _boxplus(llr[..., :half], llr[..., half:]))
        decode(s - 1, lo)
        write("bl", s - 1, state["bb"][s - 1])
        llr = node_llr(s)  # re-read: left-child forks moved paths
        write("llr", s - 1, _g_op(llr[..., :half], llr[..., half:],
                                  read("bl", s - 1)))
        decode(s - 1, lo + half)
        bl, br = read("bl", s - 1), state["bb"][s - 1]
        state["bb"][s] = jnp.concatenate([jnp.mod(bl + br, 2), br],
                                         axis=-1)

    decode(m, 0)
    u = _polar_transform_bits(state["bb"][m])
    return u, state["pm"]


class PolarSCDecoder(Block):
    """Successive cancellation decoder (reference decoding.py:15).

    Input llr_ch [..., n] as logits; output hard info bits [..., k].
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
            raise ValueError("Num. of elements in frozen_pos cannot "
                             "be greater than n.")
        if np.log2(n) != int(np.log2(n)):
            raise ValueError("n must be a power of 2.")
        self._n = n
        self._frozen_pos = frozen_pos
        self._k = n - len(frozen_pos)
        self._info_pos = np.setdiff1d(np.arange(n), frozen_pos)
        self._frozen_mask = np.zeros(n, np.float32)
        self._frozen_mask[frozen_pos] = 1

    @property
    def n(self):
        return self._n

    @property
    def k(self):
        return self._k

    @property
    def frozen_pos(self):
        return self._frozen_pos

    @property
    def info_pos(self):
        return self._info_pos

    def call(self, llr_ch, /):
        llr_ch = jnp.asarray(llr_ch, self.rdtype)
        in_shape = llr_ch.shape
        llr = jnp.reshape(llr_ch, (-1, self._n))
        llr = -llr  # logits -> classic LLRs
        # batch-native fast-SSC (identical decisions to bit-by-bit SC)
        u_hat = _fast_sc_decode_batch(llr, self._frozen_mask, self._n)
        u_out = jnp.take(u_hat, jnp.asarray(self._info_pos), axis=-1)
        return jnp.reshape(u_out, tuple(in_shape[:-1]) + (self._k,))


class PolarSCLDecoder(Block):
    """Successive cancellation list decoder
    (reference decoding.py:266).

    Input llr_ch [..., n] as logits; output hard info bits [..., k]
    (best path; CRC-aided selection if ``crc_degree`` is set).
    """

    def __init__(self, frozen_pos, n, list_size=8, crc_degree=None,
                 use_hybrid_sc=False, use_fast_scl=True,
                 cpu_only=False, use_scatter=False, ind_iil_inv=None,
                 return_crc_status=False, use_spc=False,
                 precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        # use_fast_scl selects the pruned-tree decoder (rate-0/rep/
        # rate-1 node shortcuts with exact node path metrics; the
        # reference prunes rate-0/rep only).  Rate-1 forking explores
        # least-reliable bits first — the exact top-L extension within
        # the node — so rare blocks may differ from the per-bit
        # schedule (BLER statistically identical; see
        # tests/test_fec_polar.py).
        # use_hybrid_sc/cpu_only/use_scatter are TF-graph workarounds
        # in the reference with no TPU counterpart; they are accepted
        # for API parity and do not change the output.
        if use_hybrid_sc or cpu_only or use_scatter:
            warnings.warn(
                "use_hybrid_sc/cpu_only/use_scatter have no effect in "
                "the TPU implementation (output is unchanged)",
                stacklevel=2)
        self._use_fast_scl = bool(use_fast_scl)
        # use_spc additionally prunes single-parity-check nodes with
        # the NODE-OPTIMAL fork schedule (better-or-equal to, but not
        # bit-identical with, per-bit SCL — see
        # _fast_scl_decode_batch); off by default for reference parity
        self._use_spc = bool(use_spc)
        n = int(n)
        frozen_pos = np.asarray(frozen_pos)
        if np.log2(n) != int(np.log2(n)):
            raise ValueError("n must be a power of 2.")
        if not (isinstance(list_size, int)
                and (list_size & (list_size - 1)) == 0):
            raise ValueError("list_size must be a power of 2.")
        self._n = n
        self._frozen_pos = frozen_pos
        self._k = n - len(frozen_pos)
        self._info_pos = np.setdiff1d(np.arange(n), frozen_pos)
        self._frozen_mask = np.zeros(n, np.float32)
        self._frozen_mask[frozen_pos] = 1
        self._list_size = list_size
        self._return_crc_status = bool(return_crc_status)
        self._ind_iil_inv = ind_iil_inv

        if crc_degree is not None:
            self._crc_encoder = CRCEncoder(crc_degree,
                                           precision=precision)
            self._k_crc = self._crc_encoder.crc_length
        else:
            self._crc_encoder = None
            self._k_crc = 0

    @property
    def n(self):
        return self._n

    @property
    def k(self):
        return self._k

    @property
    def k_crc(self):
        return self._k_crc

    @property
    def frozen_pos(self):
        return self._frozen_pos

    @property
    def info_pos(self):
        return self._info_pos

    @property
    def list_size(self):
        return self._list_size

    def _select_path(self, u_cand, pm):
        """Selects the output path: CRC-aided if available, else
        lowest path metric. u_cand: [list, k]."""
        if self._crc_encoder is None:
            best = jnp.argmin(pm)
            return u_cand[best], jnp.asarray(True)
        # CRC check per path (optionally undo input interleaving)
        u_check = u_cand
        if self._ind_iil_inv is not None:
            u_check = jnp.take(u_cand,
                               jnp.asarray(self._ind_iil_inv), axis=-1)
        k_info = self._k - self._k_crc
        info = u_check[..., :k_info]
        parity_rx = u_check[..., k_info:]
        pmat = jnp.asarray(self._crc_encoder._get_pmat(k_info),
                           self.rdtype)
        parity = jnp.mod(jnp.matmul(info, pmat), 2)
        crc_ok = jnp.all(parity == parity_rx, axis=-1)  # [list]
        # among CRC-passing paths pick lowest pm; fall back to global
        # best if none passes
        pm_crc = jnp.where(crc_ok, pm, jnp.inf)
        any_ok = jnp.any(crc_ok)
        best = jnp.where(any_ok, jnp.argmin(pm_crc), jnp.argmin(pm))
        return u_cand[best], any_ok

    def call(self, llr_ch, /):
        llr_ch = jnp.asarray(llr_ch, self.rdtype)
        in_shape = llr_ch.shape
        llr = -jnp.reshape(llr_ch, (-1, self._n))

        if self._use_fast_scl:
            u_list, pm = _fast_scl_decode_batch(
                llr, self._frozen_mask, self._n, self._list_size,
                use_spc=self._use_spc)
            u_cand = jnp.take(u_list, jnp.asarray(self._info_pos),
                              axis=-1)
            u_hat, crc_status = jax.vmap(self._select_path)(u_cand, pm)
        else:
            def decode_one(l):
                u_list, pm = _scl_decode_single(
                    l, self._frozen_mask, self._n, self._list_size)
                u_cand = jnp.take(u_list, jnp.asarray(self._info_pos),
                                  axis=-1)
                return self._select_path(u_cand, pm)

            u_hat, crc_status = jax.vmap(decode_one)(llr)
        u_hat = jnp.reshape(u_hat, tuple(in_shape[:-1]) + (self._k,))
        if self._return_crc_status:
            crc_status = jnp.reshape(crc_status, in_shape[:-1])
            return u_hat, crc_status
        return u_hat


class PolarBPDecoder(Block):
    """Iterative belief-propagation decoder on the polar factor graph
    (reference decoding.py:1440).

    Input llr_ch [..., n] as logits; output info bits (hard or soft).
    """

    def __init__(self, frozen_pos, n, num_iter=20, hard_out=True,
                 precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        n = int(n)
        frozen_pos = np.asarray(frozen_pos)
        if np.log2(n) != int(np.log2(n)):
            raise ValueError("n must be a power of 2.")
        self._n = n
        self._frozen_pos = frozen_pos
        self._k = n - len(frozen_pos)
        self._info_pos = np.setdiff1d(np.arange(n), frozen_pos)
        self._num_iter = int(num_iter)
        self._hard_out = bool(hard_out)
        frozen_mask = np.zeros(n, np.float32)
        frozen_mask[frozen_pos] = 1
        self._frozen_mask = frozen_mask
        self._m = _sc_stages(n)

    @property
    def n(self):
        return self._n

    @property
    def k(self):
        return self._k

    @property
    def frozen_pos(self):
        return self._frozen_pos

    @property
    def info_pos(self):
        return self._info_pos

    @property
    def num_iter(self):
        return self._num_iter

    def _stage_view(self, x, s):
        """Reshapes [..., n] into butterfly pairs of stage s:
        [..., n/2^{s+1}, 2, 2^s]."""
        n = self._n
        return jnp.reshape(x, x.shape[:-1] + (n >> (s + 1), 2, 1 << s))

    def call(self, llr_ch, /):
        llr_ch = jnp.asarray(llr_ch, self.rdtype)
        in_shape = llr_ch.shape
        llr = -jnp.reshape(llr_ch, (-1, self._n))
        batch = llr.shape[0]
        m, n = self._m, self._n

        # message arrays: l_msg[s] right-to-left messages entering
        # stage boundary s (s=0 leaves ... s=m channel);
        # r_msg[s] left-to-right messages at boundary s
        frozen = jnp.asarray(self._frozen_mask)
        r0 = jnp.where(frozen > 0, _LLR_MAX, 0.)
        r0 = jnp.broadcast_to(r0, (batch, n))

        l_msgs = jnp.zeros((m + 1, batch, n), llr.dtype)
        l_msgs = l_msgs.at[m].set(llr)
        r_msgs = jnp.zeros((m + 1, batch, n), llr.dtype)
        r_msgs = r_msgs.at[0].set(r0)

        def stage_update_r(s, l_in, r_in):
            """Computes r_{s+1} from (r_s, l_{s+1}) at stage s."""
            rv = self._stage_view(r_in, s)
            lv = self._stage_view(l_in, s)
            r_up, r_low = rv[..., 0, :], rv[..., 1, :]
            l_up, l_low = lv[..., 0, :], lv[..., 1, :]
            out_up = _boxplus(r_up, l_low + r_low)
            out_low = _boxplus(r_up, l_up) + r_low
            out = jnp.stack([out_up, out_low], axis=-2)
            return jnp.reshape(out, r_in.shape)

        def stage_update_l(s, l_in, r_in):
            """Computes l_s from (l_{s+1}, r_s) at stage s."""
            lv = self._stage_view(l_in, s)
            rv = self._stage_view(r_in, s)
            l_up, l_low = lv[..., 0, :], lv[..., 1, :]
            r_up, r_low = rv[..., 0, :], rv[..., 1, :]
            out_up = _boxplus(l_up, l_low + r_low)
            out_low = _boxplus(l_up, r_up) + l_low
            out = jnp.stack([out_up, out_low], axis=-2)
            return jnp.reshape(out, l_in.shape)

        def one_iter(_, msgs):
            l_msgs, r_msgs = msgs
            # left-to-right sweep
            for s in range(m):
                r_new = stage_update_r(s, l_msgs[s + 1], r_msgs[s])
                r_msgs = r_msgs.at[s + 1].set(r_new)
            # right-to-left sweep
            for s in range(m - 1, -1, -1):
                l_new = stage_update_l(s, l_msgs[s + 1], r_msgs[s])
                l_msgs = l_msgs.at[s].set(l_new)
            return l_msgs, r_msgs

        l_msgs, r_msgs = jax.lax.fori_loop(0, self._num_iter, one_iter,
                                           (l_msgs, r_msgs))
        # decision at the leaves (classic convention)
        llr_u = l_msgs[0] + r_msgs[0]
        u = jnp.take(llr_u, jnp.asarray(self._info_pos), axis=-1)
        if self._hard_out:
            out = (u < 0).astype(self.rdtype)
        else:
            out = -u  # back to logit convention
        return jnp.reshape(out, tuple(in_shape[:-1]) + (self._k,))


class Polar5GDecoder(Block):
    """5G polar decoder with rate recovery
    (reference decoding.py:1774).

    Wraps SC / SCL (CRC-aided) / BP and inverts the 5G rate matching
    of an associated :class:`Polar5GEncoder`.
    """

    def __init__(self, enc_polar, dec_type="SC", list_size=8,
                 num_iter=20, return_crc_status=False, use_spc=True,
                 precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        if not isinstance(enc_polar, Polar5GEncoder):
            raise TypeError("enc_polar must be Polar5GEncoder.")
        if dec_type not in ("SC", "SCL", "hybSCL", "BP"):
            raise ValueError("Unknown dec_type.")
        self._encoder = enc_polar
        self._dec_type = dec_type
        self._return_crc_status = bool(return_crc_status)
        n_polar = enc_polar.n_polar
        frozen_pos = enc_polar.frozen_pos

        # inverse input interleaver (downlink) for CRC-aided selection
        ind_iil_inv = None
        if enc_polar._ind_input_int is not None:
            ind_iil_inv = np.argsort(enc_polar._ind_input_int)

        if dec_type == "SC":
            self._decoder = PolarSCDecoder(frozen_pos, n_polar,
                                           precision=precision)
        elif dec_type in ("SCL", "hybSCL"):
            # use_spc=True (default): SSCL-SPC single-parity-check
            # node pruning.  The SPC fork rule is NODE-OPTIMAL
            # (better-or-equal to the reference's greedy per-bit
            # schedule, see PolarSCLDecoder) and ~1.5x faster; BLER
            # equivalence is quantified in
            # tests/test_fec_polar.py::test_scl_spc_bler_delta.
            # Pass use_spc=False for the bit-exact reference
            # schedule.
            self._decoder = PolarSCLDecoder(
                frozen_pos, n_polar, list_size=list_size,
                crc_degree=enc_polar.enc_crc.crc_degree,
                ind_iil_inv=ind_iil_inv, use_spc=use_spc,
                return_crc_status=True, precision=precision)
        else:
            self._decoder = PolarBPDecoder(frozen_pos, n_polar,
                                           num_iter=num_iter,
                                           precision=precision)
        self._crc_decoder = CRCDecoder(enc_polar.enc_crc,
                                       precision=precision)
        # rate-recovery scatter: accumulate received LLRs back onto
        # mother-codeword positions (handles repetition by summation;
        # punctured positions get 0, shortened positions get +inf
        # towards bit 0)
        self._rm_ind = enc_polar._ind_rate_matching
        k_polar = enc_polar.k_polar
        n_target = enc_polar.n_target
        # shortened positions: codeword bits known to be zero
        if n_target < n_polar and k_polar / n_target > 7 / 16:
            covered = np.unique(self._rm_ind)
            self._shortened_pos = np.setdiff1d(np.arange(n_polar),
                                               covered)
        else:
            self._shortened_pos = np.zeros(0, int)
        self._ind_input_int = enc_polar._ind_input_int

    @property
    def dec_type(self):
        return self._dec_type

    @property
    def decoder(self):
        return self._decoder

    def call(self, llr_ch, /):
        enc = self._encoder
        llr_ch = jnp.asarray(llr_ch, self.rdtype)
        in_shape = llr_ch.shape
        llr = jnp.reshape(llr_ch, (-1, enc.n_target))
        batch = llr.shape[0]

        # undo rate matching: scatter-add onto mother codeword; the
        # logit convention flows straight through (sum of repeated
        # observations)
        llr_mother = jnp.zeros((batch, enc.n_polar), llr.dtype)
        llr_mother = llr_mother.at[:, jnp.asarray(self._rm_ind)].add(
            llr)
        if len(self._shortened_pos) > 0:
            # shortened bits are known zeros: strong negative logit
            llr_mother = llr_mother.at[
                :, jnp.asarray(self._shortened_pos)].set(-_LLR_MAX)

        out = self._decoder(llr_mother)
        if self._dec_type in ("SCL", "hybSCL"):
            u_crc, crc_status = out
        else:
            u_crc = out
            crc_status = None
        # undo downlink input interleaving
        if self._ind_input_int is not None:
            u_crc = jnp.take(u_crc,
                             jnp.asarray(
                                 np.argsort(self._ind_input_int)),
                             axis=-1)
        u_hat, crc_ok = self._crc_decoder(u_crc)
        if crc_status is None:
            crc_status = crc_ok[..., 0]
        u_hat = jnp.reshape(u_hat,
                            tuple(in_shape[:-1]) + (enc.k_target,))
        if self._return_crc_status:
            crc_status = jnp.reshape(crc_status, in_shape[:-1])
            return u_hat, crc_status
        return u_hat
