"""Sionna-TPU PHY package (reference: src/sionna/phy/__init__.py)."""

from .config import config, dtypes
from .block import Object, Block
from . import constants
from .constants import SPEED_OF_LIGHT, BOLTZMANN_CONSTANT, PI, H, ALPHA_MAX
from . import utils
from . import mapping
from .mapping import (
    Constellation, Mapper, Demapper, SymbolDemapper, SymbolLogits2LLRs,
    LLRs2SymbolLogits, SymbolLogits2Moments, SymbolInds2Bits, QAM2PAM,
    PAM2QAM, BinarySource, SymbolSource, QAMSource, PAMSource)
from . import channel
from .channel import AWGN
from . import fec
from . import signal
from . import ofdm
from . import mimo
