"""3GPP LTE turbo encoding (reference:
src/sionna/phy/fec/turbo/encoding.py:16; fresh JAX implementation)."""

import numpy as np

import jax.numpy as jnp

from ...block import Block
from .. import interleaving
from ..conv.encoding import ConvEncoder
from ..conv.utils import Trellis
from .utils import (polynomial_selector, puncture_pattern,
                    TurboTermination)

__all__ = ["TurboEncoder"]


class TurboEncoder(Block):
    """Parallel-concatenated RSC turbo encoder with 3GPP interleaver,
    optional termination and rate-1/2 puncturing."""

    def __init__(self, gen_poly=None, constraint_length=3, rate=1 / 3,
                 terminate=False, interleaver_type="3GPP",
                 precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        if gen_poly is not None:
            if len(gen_poly) != 2:
                raise ValueError(
                    "Generator polynomials need to be of rate-1/2")
            self._gen_poly = gen_poly
        else:
            self._gen_poly = polynomial_selector(constraint_length)
        if rate not in (1 / 2, 1 / 3):
            raise ValueError("Invalid coderate.")
        if interleaver_type not in ("3GPP", "random"):
            raise ValueError("Invalid interleaver_type.")
        self._coderate_desired = rate
        self._coderate = rate
        self._terminate = bool(terminate)
        self._interleaver_type = interleaver_type
        self._coderate_conv = 1 / len(self._gen_poly)
        self._punct_pattern = puncture_pattern(rate,
                                               self._coderate_conv)
        self._trellis = Trellis(self._gen_poly, rsc=True)
        self._mu = self._trellis._mu
        self._conv_n = self._trellis.conv_n
        self._k = None
        self._n = None
        if self._terminate:
            self.turbo_term = TurboTermination(self._mu + 1,
                                               conv_n=self._conv_n)
        if interleaver_type == "3GPP":
            self.internal_interleaver = \
                interleaving.Turbo3GPPInterleaver()
        else:
            self.internal_interleaver = interleaving.RandomInterleaver(
                keep_batch_constant=True, keep_state=True, axis=-1)
        self.convencoder = ConvEncoder(gen_poly=self._gen_poly,
                                       rsc=True,
                                       terminate=self._terminate)

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
    def terminate(self):
        return self._terminate

    @property
    def punct_pattern(self):
        return self._punct_pattern

    @property
    def k(self):
        return self._k

    @property
    def n(self):
        return self._n

    def _puncture(self, cw):
        """cw: [batch, syms, 3]; keeps entries where the tiled
        pattern is True."""
        pattern = self._punct_pattern  # [p, 3] bool
        syms = cw.shape[1]
        reps = int(np.ceil(syms / pattern.shape[0]))
        mask = np.tile(pattern, (reps, 1))[:syms]  # [syms, 3]
        keep = np.where(mask.reshape(-1))[0]
        flat = jnp.reshape(cw, (cw.shape[0], -1))
        return jnp.take(flat, jnp.asarray(keep), axis=-1)

    def call(self, bits):
        bits = jnp.asarray(bits, self.rdtype)
        k = bits.shape[-1]
        self._k = k
        in_shape = bits.shape
        msg = jnp.reshape(bits, (-1, k))
        term_syms_turbo = self.turbo_term.get_num_term_syms() \
            if self._terminate else 0

        msg2 = self.internal_interleaver(msg)
        cw1_ = self.convencoder(msg)
        cw2_ = self.convencoder(msg2)
        preterm_n = int(k / self._coderate_conv)
        cw1, term1 = cw1_[:, :preterm_n], cw1_[:, preterm_n:]
        cw2, term2 = cw2_[:, :preterm_n], cw2_[:, preterm_n:]

        # parity stream of second encoder (odd positions)
        par_idx = jnp.arange(1, preterm_n, self._conv_n)
        cw2_par = jnp.take(cw2, par_idx, axis=-1)
        cw1_r = jnp.reshape(cw1, (-1, k, self._conv_n))
        cw = jnp.concatenate([cw1_r, cw2_par[..., None]], axis=-1)

        if self._terminate:
            term_syms = self.turbo_term.termbits_conv2turbo(term1,
                                                            term2)
            term_syms = jnp.reshape(term_syms, (-1, term_syms_turbo, 3))
            cw = jnp.concatenate([cw, term_syms], axis=-2)

        if self._punct_pattern is not None:
            out = self._puncture(cw)
        else:
            out = jnp.reshape(cw, (cw.shape[0], -1))
        self._n = out.shape[-1]
        return jnp.reshape(out, tuple(in_shape[:-1]) + (self._n,))
