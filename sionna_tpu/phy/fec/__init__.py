"""Forward error correction sub-package (reference:
src/sionna/phy/fec/__init__.py)."""

from . import crc
from . import scrambling
from . import interleaving
from . import ldpc
from . import polar
from . import conv
from . import turbo
from . import linear
from . import utils
from .crc import CRCEncoder, CRCDecoder
from .scrambling import Scrambler, TB5GScrambler, Descrambler
from .interleaving import (RowColumnInterleaver, RandomInterleaver,
                           Deinterleaver, Turbo3GPPInterleaver)
