"""Pulse-shaping filters (reference: src/sionna/phy/signal/filter.py:12,
287,408,536,627; fresh JAX implementations).

Coefficients are computed on the host (NumPy, static length); the
filter application is one batched convolution (signal.utils.convolve).
"""

import numpy as np

import jax.numpy as jnp

from ..block import Block
from .utils import convolve
from .window import Window, HannWindow, HammingWindow, BlackmanWindow

__all__ = ["Filter", "RaisedCosineFilter", "RootRaisedCosineFilter",
           "SincFilter", "CustomFilter"]


class Filter(Block):
    """Base filter of odd length K = span_in_symbols *
    samples_per_symbol (next odd)."""

    def __init__(self, span_in_symbols, samples_per_symbol, window=None,
                 normalize=True, precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        if span_in_symbols <= 0:
            raise ValueError("span_in_symbols must be positive")
        if samples_per_symbol <= 0:
            raise ValueError("samples_per_symbol must be positive")
        self._span_in_symbols = int(span_in_symbols)
        self._samples_per_symbol = int(samples_per_symbol)
        self.window = window
        if not isinstance(normalize, bool):
            raise TypeError("normalize must be bool")
        self._normalize = normalize
        self._coefficients = None

    @property
    def span_in_symbols(self):
        return self._span_in_symbols

    @property
    def samples_per_symbol(self):
        return self._samples_per_symbol

    @property
    def length(self):
        l = self._span_in_symbols * self._samples_per_symbol
        return 2 * (l // 2) + 1

    @property
    def window(self):
        return self._window

    @window.setter
    def window(self, value):
        if isinstance(value, str):
            wins = {"hann": HannWindow, "hamming": HammingWindow,
                    "blackman": BlackmanWindow}
            if value not in wins:
                raise ValueError("Invalid window type")
            self._window = wins[value](precision=self.precision)
        elif isinstance(value, Window) or value is None:
            self._window = value
        else:
            raise TypeError("Invalid window type")

    @property
    def normalize(self):
        return self._normalize

    @property
    def coefficients(self):
        return self._coefficients

    @coefficients.setter
    def coefficients(self, v):
        v = np.asarray(v)
        if np.iscomplexobj(v):
            self._coefficients = v.astype(self.np_cdtype)
        else:
            self._coefficients = v.astype(self.np_rdtype)

    @property
    def sampling_times(self):
        """Sampling times in multiples of the symbol duration."""
        n_min = -(self.length // 2)
        n_max = n_min + self.length
        t = np.arange(n_min, n_max, dtype=np.float32)
        return t / self.samples_per_symbol

    def _effective_coefficients(self, conjugate=False):
        h = jnp.asarray(self._coefficients)
        if self._window is not None:
            h = self._window(h)
        if self._normalize:
            energy = jnp.sum(jnp.abs(h) ** 2)
            h = h / jnp.sqrt(energy).astype(h.dtype)
        if conjugate and jnp.issubdtype(h.dtype, jnp.complexfloating):
            h = jnp.conj(h)
        return h

    @property
    def aclr(self):
        """ACLR of the filter in dB assuming a rectangular in-band
        spectrum of one symbol bandwidth."""
        h = np.asarray(self._effective_coefficients())
        n = max(1024, len(h))
        spec = np.abs(np.fft.fftshift(np.fft.fft(h, n))) ** 2
        f = np.fft.fftshift(np.fft.fftfreq(n)) * self.samples_per_symbol
        in_band = np.abs(f) <= 0.5
        return float(spec[~in_band].sum() / spec[in_band].sum())

    def call(self, x, padding="full", conjugate=False):
        h = self._effective_coefficients(conjugate)
        return convolve(x, h, padding=padding, precision=self.precision)

    def show(self, response="impulse", scale="lin"):
        import matplotlib.pyplot as plt
        h = np.asarray(self._effective_coefficients())
        plt.figure()
        if response == "impulse":
            plt.plot(self.sampling_times, np.real(h))
            plt.xlabel("Time (symbols)")
        else:
            n = 1024
            spec = np.abs(np.fft.fftshift(np.fft.fft(h, n)))
            f = np.fft.fftshift(np.fft.fftfreq(n)) * self.samples_per_symbol
            if scale == "db":
                spec = 20 * np.log10(np.maximum(spec, 1e-12))
            plt.plot(f, spec)
            plt.xlabel("Frequency (1/symbol duration)")
        plt.grid(True)


class RaisedCosineFilter(Filter):
    """Raised-cosine filter with roll-off ``beta``
    (reference filter.py:287)."""

    def __init__(self, span_in_symbols, samples_per_symbol, beta,
                 window=None, normalize=True, precision=None, **kwargs):
        super().__init__(span_in_symbols, samples_per_symbol,
                         window=window, normalize=normalize,
                         precision=precision, **kwargs)
        if not 0 <= beta <= 1:
            raise ValueError("beta must be in [0, 1]")
        self._beta = float(beta)
        self.coefficients = self._raised_cosine(self.sampling_times, 1.0,
                                                self._beta)

    @property
    def beta(self):
        return self._beta

    @staticmethod
    def _raised_cosine(t, symbol_duration, beta):
        h = np.zeros(len(t), np.float32)
        for i, tt in enumerate(t):
            tt = abs(tt)
            if beta > 0 and abs(tt - symbol_duration / 2 / beta) < 1e-12:
                h[i] = np.pi / 4 / symbol_duration * np.sinc(1 / 2 / beta)
            else:
                h[i] = (1 / symbol_duration
                        * np.sinc(tt / symbol_duration)
                        * np.cos(np.pi * beta * tt / symbol_duration)
                        / (1 - (2 * beta * tt / symbol_duration) ** 2))
        return h


class RootRaisedCosineFilter(Filter):
    """Root-raised-cosine filter with roll-off ``beta``
    (reference filter.py:408)."""

    def __init__(self, span_in_symbols, samples_per_symbol, beta,
                 window=None, normalize=True, precision=None, **kwargs):
        super().__init__(span_in_symbols, samples_per_symbol,
                         window=window, normalize=normalize,
                         precision=precision, **kwargs)
        if not 0 <= beta <= 1:
            raise ValueError("beta must be in [0, 1]")
        self._beta = float(beta)
        self.coefficients = self._root_raised_cosine(
            self.sampling_times, 1.0, self._beta)

    @property
    def beta(self):
        return self._beta

    @staticmethod
    def _root_raised_cosine(t, symbol_duration, beta):
        h = np.zeros(len(t), np.float32)
        for i, tt in enumerate(t):
            tt = abs(tt)
            if tt < 1e-12:
                h[i] = 1 / symbol_duration * (1 + beta * (4 / np.pi - 1))
            elif beta > 0 and \
                    abs(tt - symbol_duration / 4 / beta) < 1e-12:
                h[i] = (beta / symbol_duration / np.sqrt(2)
                        * ((1 + 2 / np.pi) * np.sin(np.pi / 4 / beta)
                           + (1 - 2 / np.pi) * np.cos(np.pi / 4 / beta)))
            else:
                x = tt / symbol_duration
                h[i] = (1 / symbol_duration
                        / (np.pi * x * (1 - (4 * beta * x) ** 2))
                        * (np.sin(np.pi * x * (1 - beta))
                           + 4 * beta * x * np.cos(np.pi * x * (1 + beta))))
        return h


class SincFilter(Filter):
    """Sinc (ideal low-pass) filter (reference filter.py:536)."""

    def __init__(self, span_in_symbols, samples_per_symbol, window=None,
                 normalize=True, precision=None, **kwargs):
        super().__init__(span_in_symbols, samples_per_symbol,
                         window=window, normalize=normalize,
                         precision=precision, **kwargs)
        self.coefficients = self._sinc(self.sampling_times, 1.0)

    @staticmethod
    def _sinc(t, symbol_duration):
        return (1 / symbol_duration
                * np.sinc(np.asarray(t) / symbol_duration))


class CustomFilter(Filter):
    """Filter with user-provided coefficients
    (reference filter.py:627)."""

    def __init__(self, samples_per_symbol, coefficients, window=None,
                 normalize=True, precision=None, **kwargs):
        coefficients = np.asarray(coefficients)
        span = max(1, int(np.ceil(len(coefficients)
                                  / samples_per_symbol)))
        super().__init__(span, samples_per_symbol, window=window,
                         normalize=normalize, precision=precision,
                         **kwargs)
        self.coefficients = coefficients

    @property
    def length(self):
        return self._coefficients.shape[0]

    @property
    def sampling_times(self):
        n_min = -(self.length // 2)
        n_max = n_min + self.length
        t = np.arange(n_min, n_max, dtype=np.float32)
        return t / self.samples_per_symbol
