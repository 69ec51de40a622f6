"""Viterbi and BCJR decoding (reference:
src/sionna/phy/fec/conv/decoding.py:13,456; fresh JAX
implementations).

TPU design: both decoders are ``lax.scan`` recursions over time with
[batch, num_states] metrics; branch metrics are a single einsum of the
LLRs with the static per-branch output-bit table. Viterbi traceback is
a reverse scan over stored survivor decisions.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ...block import Block
from .utils import Trellis, polynomial_selector

__all__ = ["ViterbiDecoder", "BCJRDecoder"]

_NEG_INF = -1e9


def _resolve_trellis(encoder, gen_poly, rate, constraint_length, rsc,
                     terminate):
    if encoder is not None:
        return encoder.gen_poly, encoder.trellis, encoder.terminate
    if gen_poly is None:
        gen_poly = polynomial_selector(rate, constraint_length)
    return gen_poly, Trellis(gen_poly, rsc=rsc), terminate


class _ConvDecoderBase(Block):
    def __init__(self, *, encoder=None, gen_poly=None, rate=1 / 2,
                 constraint_length=3, rsc=False, terminate=False,
                 precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        self._gen_poly, self._trellis, self._terminate = \
            _resolve_trellis(encoder, gen_poly, rate,
                             constraint_length, rsc, terminate)
        self._mu = self._trellis._mu
        self._conv_n = self._trellis.conv_n
        self._ns = self._trellis.ns
        self._ni = self._trellis.ni
        # branch output bits in +-1 form: [ns, ni, conv_n]
        self._op_pm1 = (2 * self._trellis.op_bits_by_fromnode
                        - 1).astype(np.float32)

    @property
    def gen_poly(self):
        return self._gen_poly

    @property
    def trellis(self):
        return self._trellis

    @property
    def terminate(self):
        return self._terminate

    @property
    def coderate(self):
        return 1 / self._conv_n

    def _branch_metrics(self, llr_t):
        """Branch metric for every (state, input) at one time step.
        llr_t: [batch, conv_n] logits. Returns [batch, ns, ni]
        correlation metrics (to maximize)."""
        op = jnp.asarray(self._op_pm1)
        return 0.5 * jnp.einsum("bc,sic->bsi", llr_t, op)

    def _num_syms(self, n):
        return n // self._conv_n


class ViterbiDecoder(_ConvDecoderBase):
    """Viterbi decoding (reference decoding.py:13).

    Input llr [..., n] as logits (or channel bits for method
    "hard"); output hard info bits [..., k].
    """

    def __init__(self, *, encoder=None, gen_poly=None, rate=1 / 2,
                 constraint_length=3, rsc=False, terminate=False,
                 method="soft_llr", return_info_bits=True,
                 precision=None, **kwargs):
        super().__init__(encoder=encoder, gen_poly=gen_poly, rate=rate,
                         constraint_length=constraint_length, rsc=rsc,
                         terminate=terminate, precision=precision,
                         **kwargs)
        if method not in ("soft_llr", "soft", "hard"):
            raise ValueError("Unknown method")
        self._method = method
        self._return_info_bits = bool(return_info_bits)

    def call(self, inputs, /):
        llr = jnp.asarray(inputs, self.rdtype)
        in_shape = llr.shape
        n = llr.shape[-1]
        num_syms = self._num_syms(n)
        term_syms = self._mu if self._terminate else 0
        k = num_syms - term_syms
        llr = jnp.reshape(llr, (-1, num_syms, self._conv_n))
        if self._method == "hard":
            # bits {0,1} -> pseudo-LLRs
            llr = 2. * llr - 1.
        batch = llr.shape[0]

        to_nodes = jnp.asarray(self._trellis.to_nodes, jnp.int32)
        from_nodes = jnp.asarray(self._trellis.from_nodes, jnp.int32)
        ip_by_tonode = jnp.asarray(self._trellis.ip_by_tonode,
                                   jnp.int32)
        # branch metric table arranged by to-node:
        # bm_to[b, s_to, j] = metric of branch from from_nodes[s_to,j]
        op_to = np.zeros((self._ns, self._ni, self._conv_n), np.float32)
        for s_to in range(self._ns):
            for j in range(self._ni):
                s_from = self._trellis.from_nodes[s_to][j]
                i_in = self._trellis.ip_by_tonode[s_to][j]
                op_to[s_to, j] = (
                    2 * self._trellis.op_bits_by_fromnode[s_from, i_in]
                    - 1)
        op_to = jnp.asarray(op_to)

        def fwd(cm, llr_t):
            # metric of incoming branches per to-node
            bm = 0.5 * jnp.einsum("bc,sjc->bsj", llr_t, op_to)
            cand = jnp.take(cm, from_nodes, axis=-1) + bm
            best = jnp.argmax(cand, axis=-1)  # [batch, ns]
            cm_new = jnp.max(cand, axis=-1)
            return cm_new, best.astype(jnp.int32)

        cm0 = jnp.full((batch, self._ns), _NEG_INF, self.rdtype)
        cm0 = cm0.at[:, 0].set(0.)
        cm, bt = jax.lax.scan(fwd, cm0,
                              jnp.transpose(llr, (1, 0, 2)))
        # bt: [T, batch, ns] index of best incoming branch

        final_state = jnp.zeros((batch,), jnp.int32) if \
            self._terminate else jnp.argmax(cm, axis=-1).astype(
                jnp.int32)

        def bwd(state, bt_t):
            j = jnp.take_along_axis(bt_t, state[:, None],
                                    axis=-1)[:, 0]
            bit = ip_by_tonode[state, j]
            prev = from_nodes[state, j]
            return prev, bit

        _, bits_rev = jax.lax.scan(bwd, final_state, bt[::-1])
        bits = jnp.transpose(bits_rev[::-1], (1, 0))  # [batch, T]
        if self._return_info_bits:
            bits = bits[:, :k]
            out_len = k
        else:
            out_len = num_syms
        out = bits.astype(self.rdtype)
        return jnp.reshape(out, tuple(in_shape[:-1]) + (out_len,))


class BCJRDecoder(_ConvDecoderBase):
    """BCJR (MAP) decoding (reference decoding.py:456).

    Input llr [..., n] as logits; output info-bit LLRs (logits) or
    hard decisions.
    """

    def __init__(self, *, encoder=None, gen_poly=None, rate=1 / 2,
                 constraint_length=3, rsc=False, terminate=False,
                 hard_out=True, algorithm="map", precision=None,
                 **kwargs):
        super().__init__(encoder=encoder, gen_poly=gen_poly, rate=rate,
                         constraint_length=constraint_length, rsc=rsc,
                         terminate=terminate, precision=precision,
                         **kwargs)
        if algorithm not in ("map", "log", "maxlog"):
            raise ValueError("Unknown algorithm")
        self._algorithm = algorithm
        self._hard_out = bool(hard_out)

    def _reduce(self, x, axis):
        if self._algorithm == "maxlog":
            return jnp.max(x, axis=axis)
        return jax.scipy.special.logsumexp(x, axis=axis)

    def call(self, inputs, /, prior=None):
        llr = jnp.asarray(inputs, self.rdtype)
        in_shape = llr.shape
        n = llr.shape[-1]
        num_syms = self._num_syms(n)
        term_syms = self._mu if self._terminate else 0
        k = num_syms - term_syms
        llr = jnp.reshape(llr, (-1, num_syms, self._conv_n))
        batch = llr.shape[0]

        to_nodes = jnp.asarray(self._trellis.to_nodes, jnp.int32)
        # gamma[b, t, s, i] = 0.5 * sum_c (2op-1) llr + prior term
        op = jnp.asarray(self._op_pm1)
        gamma = 0.5 * jnp.einsum("btc,sic->btsi", llr, op)
        if prior is not None:
            prior = jnp.asarray(prior, self.rdtype)
            prior = jnp.reshape(prior, (-1, k))
            pr = jnp.pad(prior, ((0, 0), (0, term_syms)))
            # add 0.5*(2i-1)*prior for input i
            sign = jnp.asarray([-1., 1.], self.rdtype)
            gamma = gamma + 0.5 * pr[:, :, None, None] * sign

        # forward recursion
        def fwd(alpha, gamma_t):
            # alpha: [batch, ns]; cand[b, s_from, i] over to-node
            cand = alpha[:, :, None] + gamma_t  # [b, s, i]
            # scatter to to-nodes: build [b, ns] via segment trick
            flat_to = to_nodes.reshape(-1)  # [ns*ni]
            candf = cand.reshape(batch, -1)
            # logsumexp segment: use one-hot matmul in log domain via
            # max trick per to-node
            onehot = jax.nn.one_hot(flat_to, self._ns,
                                    dtype=self.rdtype)
            if self._algorithm == "maxlog":
                alpha_new = jnp.max(
                    jnp.where(onehot.T[None] > 0, candf[:, None, :],
                              _NEG_INF), axis=-1)
            else:
                m = jnp.max(jnp.where(onehot.T[None] > 0,
                                      candf[:, None, :], _NEG_INF),
                            axis=-1, keepdims=True)
                alpha_new = m[..., 0] + jnp.log(jnp.sum(
                    jnp.where(onehot.T[None] > 0,
                              jnp.exp(candf[:, None, :] - m), 0.),
                    axis=-1))
            alpha_new = alpha_new - jnp.max(alpha_new, axis=-1,
                                            keepdims=True)
            return alpha_new, alpha

        alpha0 = jnp.full((batch, self._ns), _NEG_INF, self.rdtype)
        alpha0 = alpha0.at[:, 0].set(0.)
        _, alphas = jax.lax.scan(fwd, alpha0,
                                 jnp.transpose(gamma, (1, 0, 2, 3)))
        # alphas[t] = alpha before step t

        # backward recursion
        def bwd(beta, gamma_t):
            # beta: [batch, ns] (indexed by to-node)
            beta_from = beta[:, None, :]  # broadcast over from-states
            cand = gamma_t + jnp.take(beta, to_nodes,
                                      axis=-1)  # [b, s, i]
            beta_new = self._reduce(cand, axis=-1)
            beta_new = beta_new - jnp.max(beta_new, axis=-1,
                                          keepdims=True)
            return beta_new, beta

        if self._terminate:
            betaT = jnp.full((batch, self._ns), _NEG_INF, self.rdtype)
            betaT = betaT.at[:, 0].set(0.)
        else:
            betaT = jnp.zeros((batch, self._ns), self.rdtype)
        _, betas_rev = jax.lax.scan(
            bwd, betaT, jnp.transpose(gamma, (1, 0, 2, 3))[::-1])
        betas = betas_rev[::-1]  # betas[t] = beta after step t

        # LLR per input bit: logits log P(u=1)/P(u=0)
        # metric[b, t, s, i] = alpha[t][s] + gamma[t,s,i]
        #                      + beta[t][to_nodes[s,i]]
        beta_to = jnp.take(betas, to_nodes, axis=-1)  # [T, b, s, i]
        metric = (alphas[..., None] + jnp.transpose(gamma, (1, 0, 2, 3))
                  + beta_to)
        llr_out = (self._reduce(metric[..., 1], axis=-1)
                   - self._reduce(metric[..., 0], axis=-1))  # [T, b]
        llr_out = jnp.transpose(llr_out, (1, 0))[:, :k]
        if self._hard_out:
            out = (llr_out > 0).astype(self.rdtype)
        else:
            out = llr_out
        return jnp.reshape(out, tuple(in_shape[:-1]) + (k,))
