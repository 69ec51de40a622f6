"""Convolutional codes (reference:
src/sionna/phy/fec/conv/__init__.py)."""

from .encoding import ConvEncoder
from .decoding import ViterbiDecoder, BCJRDecoder
from .utils import Trellis, polynomial_selector
