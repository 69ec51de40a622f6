"""Turbo code utilities (reference:
src/sionna/phy/fec/turbo/utils.py:10,49,81; fresh implementations)."""

import math

import numpy as np

__all__ = ["polynomial_selector", "puncture_pattern",
           "TurboTermination"]


def polynomial_selector(constraint_length):
    """RSC generator polynomials for turbo codes
    (reference turbo/utils.py:10)."""
    if not isinstance(constraint_length, int):
        raise TypeError("constraint_length must be int.")
    if not 2 < constraint_length < 7:
        raise ValueError("Unsupported constraint_length.")
    table = {
        3: ("111", "101"),
        4: ("1011", "1101"),
        5: ("10011", "11011"),
        6: ("111101", "101011"),
    }
    return table[constraint_length]


def puncture_pattern(turbo_coderate, conv_coderate):
    """Puncturing pattern achieving ``turbo_coderate``
    (reference turbo/utils.py:49)."""
    if conv_coderate != 1 / 2:
        raise ValueError("Only conv_coderate 1/2 supported.")
    if turbo_coderate == 1 / 2:
        return np.array([[1, 1, 0], [1, 0, 1]], bool)
    if turbo_coderate == 1 / 3:
        return np.array([[1, 1, 1]], bool)
    raise NotImplementedError("turbo_coderate not supported")


class TurboTermination:
    """Merges/splits constituent-encoder termination bits to/from the
    turbo bit streams (reference turbo/utils.py:81)."""

    def __init__(self, constraint_length, conv_n=2, num_conv_encs=2,
                 num_bitstreams=3):
        self.mu_ = int(constraint_length) - 1
        self.conv_n = int(conv_n)
        if num_conv_encs != 2:
            raise NotImplementedError("Only num_conv_encs=2 supported.")
        self.num_conv_encs = num_conv_encs
        self.num_bitstreams = int(num_bitstreams)

    def get_num_term_syms(self):
        total_term_bits = self.conv_n * self.num_conv_encs * self.mu_
        return math.ceil(total_term_bits / self.num_bitstreams)

    def termbits_conv2turbo(self, term_bits1, term_bits2):
        """Concatenates the two termination streams and zero-pads to a
        multiple of num_bitstreams. Works on [batch, ...] arrays."""
        import jax.numpy as jnp
        term = jnp.concatenate([term_bits1, term_bits2], axis=-1)
        total = term.shape[-1]
        pad = (self.num_bitstreams
               - total % self.num_bitstreams) % self.num_bitstreams
        if pad > 0:
            term = jnp.concatenate(
                [term, jnp.zeros(term.shape[:-1] + (pad,),
                                 term.dtype)], axis=-1)
        return term

    def term_bits_turbo2conv(self, term_bits):
        """Splits turbo termination bits back into the two constituent
        streams."""
        import jax.numpy as jnp
        n1 = self.conv_n * self.mu_
        t1 = term_bits[..., :n1]
        t2 = term_bits[..., n1:2 * n1]
        return t1, t2
