"""Signal sub-package (reference: src/sionna/phy/signal/__init__.py)."""

from .utils import convolve, fft, ifft, empirical_psd, empirical_aclr
from .window import (Window, CustomWindow, HannWindow, HammingWindow,
                     BlackmanWindow)
from .filter import (Filter, RaisedCosineFilter, RootRaisedCosineFilter,
                     SincFilter, CustomFilter)
from .upsampling import Upsampling
from .downsampling import Downsampling
