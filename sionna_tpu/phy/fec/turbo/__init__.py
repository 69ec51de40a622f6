"""Turbo codes (reference: src/sionna/phy/fec/turbo/__init__.py)."""

from .encoding import TurboEncoder
from .decoding import TurboDecoder
from .utils import polynomial_selector, puncture_pattern, \
    TurboTermination
from . import coeffs
