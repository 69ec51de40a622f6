"""Universal linear codes (reference:
src/sionna/phy/fec/linear/__init__.py)."""

from .encoding import LinearEncoder
from .decoding import OSDecoder
