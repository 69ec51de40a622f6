"""Iterative turbo decoding (reference:
src/sionna/phy/fec/turbo/decoding.py:15; fresh JAX implementation).

Two soft-output BCJR constituent decoders exchange extrinsic
information through the interleaver; the iteration count is static so
the whole decoder is one fused jit graph.
"""

import numpy as np

import jax.numpy as jnp

from ...block import Block
from .. import interleaving
from ..conv.decoding import BCJRDecoder
from ..conv.utils import Trellis
from .utils import (polynomial_selector, puncture_pattern,
                    TurboTermination)
from .encoding import TurboEncoder

__all__ = ["TurboDecoder"]

_LLR_MAX = 20.0


class TurboDecoder(Block):
    """Iterative BCJR turbo decoder.

    Input llr [..., n] as logits; output hard (or soft) info bits
    [..., k].
    """

    def __init__(self, encoder=None, gen_poly=None,
                 constraint_length=3, rate=1 / 3, terminate=False,
                 num_iter=6, hard_out=True, algorithm="map",
                 interleaver_type="3GPP", precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        if encoder is not None:
            if not isinstance(encoder, TurboEncoder):
                raise TypeError("encoder must be a TurboEncoder")
            self._gen_poly = encoder.gen_poly
            self._terminate = encoder.terminate
            self._coderate = encoder.coderate
            self._punct_pattern = encoder.punct_pattern
            self.internal_interleaver = encoder.internal_interleaver
        else:
            if gen_poly is not None:
                self._gen_poly = gen_poly
            else:
                self._gen_poly = polynomial_selector(constraint_length)
            self._terminate = bool(terminate)
            self._coderate = rate
            self._punct_pattern = puncture_pattern(rate, 1 / 2)
            if interleaver_type == "3GPP":
                self.internal_interleaver = \
                    interleaving.Turbo3GPPInterleaver()
            else:
                self.internal_interleaver = \
                    interleaving.RandomInterleaver(
                        keep_batch_constant=True, keep_state=True,
                        axis=-1)
        self._trellis = Trellis(self._gen_poly, rsc=True)
        self._mu = self._trellis._mu
        self._conv_n = self._trellis.conv_n
        self._num_iter = int(num_iter)
        self._hard_out = bool(hard_out)
        if self._terminate:
            self.turbo_term = TurboTermination(self._mu + 1,
                                               conv_n=self._conv_n)
        self._bcjr = BCJRDecoder(gen_poly=self._gen_poly, rsc=True,
                                 terminate=self._terminate,
                                 hard_out=False, algorithm=algorithm,
                                 precision=precision)
        self._k = None
        self._n = None

    @property
    def gen_poly(self):
        return self._gen_poly

    @property
    def constraint_length(self):
        return self._mu + 1

    @property
    def coderate(self):
        return self._coderate

    @property
    def trellis(self):
        return self._trellis

    @property
    def num_iter(self):
        return self._num_iter

    @property
    def k(self):
        return self._k

    @property
    def n(self):
        return self._n

    def _infer_k(self, n):
        """Number of info bits for a given codeword length."""
        term_bits_turbo = 3 * self.turbo_term.get_num_term_syms() \
            if self._terminate else 0
        pattern = self._punct_pattern
        rate_eff = pattern.sum() / pattern.size
        # n = k*3*rate_eff + term bits (terminations are unpunctured)
        return int(round((n - term_bits_turbo) * pattern.shape[0]
                         / pattern.sum()) // 1 // 3 * 3 // 3)

    def _depuncture(self, llr, k):
        """Inverse puncturing: scatter llr back onto [syms, 3] grid
        with zeros at punctured positions."""
        term_syms_turbo = self.turbo_term.get_num_term_syms() \
            if self._terminate else 0
        syms = k + term_syms_turbo
        pattern = self._punct_pattern
        reps = int(np.ceil(k / pattern.shape[0]))
        mask = np.tile(pattern, (reps, 1))[:k]
        # termination symbols are never punctured
        if term_syms_turbo > 0:
            mask = np.concatenate(
                [mask, np.ones((term_syms_turbo, 3), bool)], axis=0)
        keep = np.where(mask.reshape(-1))[0]
        full = jnp.zeros((llr.shape[0], syms * 3), llr.dtype)
        full = full.at[:, jnp.asarray(keep)].set(llr)
        return jnp.reshape(full, (-1, syms, 3))

    def call(self, llr_ch, /):
        llr = jnp.asarray(llr_ch, self.rdtype)
        in_shape = llr.shape
        n = llr.shape[-1]
        self._n = n
        llr = jnp.reshape(llr, (-1, n))

        # infer k from n
        term_syms_turbo = self.turbo_term.get_num_term_syms() \
            if self._terminate else 0
        pattern = self._punct_pattern
        kept_per_block = pattern.sum()
        block_rows = pattern.shape[0]
        k = int((n - 3 * term_syms_turbo) * block_rows
                // kept_per_block)
        self._k = k

        y = self._depuncture(llr, k)  # [batch, syms, 3]
        sys_llr = y[:, :k, 0]
        par1 = y[:, :k, 1]
        par2 = y[:, :k, 2]
        sys2_llr = self.internal_interleaver(sys_llr)

        # constituent codewords (interleaved sys/par per symbol)
        def mux(sys, par):
            return jnp.reshape(jnp.stack([sys, par], axis=-1),
                               (sys.shape[0], -1))
        y1 = mux(sys_llr, par1)
        y2 = mux(sys2_llr, par2)

        if self._terminate:
            term_flat = jnp.reshape(y[:, k:], (y.shape[0], -1))
            n1 = self._conv_n * self._mu
            t1 = term_flat[:, :n1]
            t2 = term_flat[:, n1:2 * n1]
            y1 = jnp.concatenate([y1, t1], axis=-1)
            y2 = jnp.concatenate([y2, t2], axis=-1)

        llr_1e = jnp.zeros((llr.shape[0], k), self.rdtype)
        llr_2i = jnp.zeros_like(sys2_llr)
        for _ in range(self._num_iter):
            llr_1i = self._bcjr(y1, prior=llr_1e)
            llr_extr = llr_1i - sys_llr - llr_1e
            llr_2e = jnp.clip(self.internal_interleaver(llr_extr),
                              -_LLR_MAX, _LLR_MAX)
            llr_2i = self._bcjr(y2, prior=llr_2e)
            llr_extr = llr_2i - llr_2e - sys2_llr
            llr_1e = jnp.clip(
                self.internal_interleaver(llr_extr, inverse=True),
                -_LLR_MAX, _LLR_MAX)
        output = self.internal_interleaver(llr_2i, inverse=True)
        if self._hard_out:
            output = (output > 0).astype(self.rdtype)
        return jnp.reshape(output, tuple(in_shape[:-1]) + (k,))
