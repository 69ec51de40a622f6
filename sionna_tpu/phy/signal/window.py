"""Window functions (reference: src/sionna/phy/signal/window.py:12-319;
fresh JAX implementations)."""

import numpy as np

import jax.numpy as jnp

from ..block import Block

__all__ = ["Window", "CustomWindow", "HannWindow", "HammingWindow",
           "BlackmanWindow"]


class Window(Block):
    """Applies a window elementwise to an input of matching length."""

    def __init__(self, normalize=False, precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        if not isinstance(normalize, bool):
            raise TypeError("normalize must be bool")
        self._normalize = normalize
        self._coefficients = None

    @property
    def coefficients(self):
        return self._coefficients

    @coefficients.setter
    def coefficients(self, v):
        self._coefficients = np.asarray(v, self.np_rdtype)

    @property
    def length(self):
        return None if self._coefficients is None \
            else self._coefficients.shape[0]

    @property
    def normalize(self):
        return self._normalize

    def _coeffs_for(self, length):
        """Returns window coefficients for ``length`` (subclasses may
        generate on demand)."""
        if self._coefficients is None or \
                self._coefficients.shape[0] != length:
            gen = getattr(self, "_generate", None)
            if gen is None:
                raise ValueError("Window length mismatch.")
            self._coefficients = np.asarray(gen(length),
                                             self.np_rdtype)
        return self._coefficients

    def call(self, x):
        x = jnp.asarray(x)
        w = jnp.asarray(self._coeffs_for(x.shape[-1]), self.rdtype)
        if self._normalize:
            energy = jnp.mean(w ** 2)
            w = w / jnp.sqrt(energy)
        return x * w.astype(x.dtype)

    def show(self, samples_per_symbol, domain="time", scale="lin"):
        import matplotlib.pyplot as plt
        w = np.asarray(self._coefficients)
        plt.figure()
        if domain == "time":
            n = len(w)
            t = (np.arange(n) - (n - 1) / 2) / samples_per_symbol
            plt.plot(t, w)
            plt.xlabel("Time (symbols)")
        else:
            spec = np.fft.fftshift(np.abs(np.fft.fft(w, 1024)))
            f = np.fft.fftshift(np.fft.fftfreq(1024)) * samples_per_symbol
            if scale == "db":
                spec = 20 * np.log10(np.maximum(spec, 1e-12))
            plt.plot(f, spec)
            plt.xlabel("Frequency (1/symbol duration)")
        plt.grid(True)


class CustomWindow(Window):
    """Window with user-provided coefficients
    (reference window.py:165)."""

    def __init__(self, coefficients, normalize=False, precision=None,
                 **kwargs):
        super().__init__(normalize=normalize, precision=precision,
                         **kwargs)
        self.coefficients = coefficients


class HannWindow(Window):
    """Hann window (reference window.py:211)."""

    def _generate(self, length):
        n = np.arange(length)
        return np.sin(np.pi * n / length) ** 2


class HammingWindow(Window):
    """Hamming window (reference window.py:264)."""

    def _generate(self, length):
        n = np.arange(length)
        a0 = 25 / 46
        return a0 - (1 - a0) * np.cos(2 * np.pi * n / length)


class BlackmanWindow(Window):
    """Blackman window (reference window.py:319)."""

    def _generate(self, length):
        n = np.arange(length)
        a0, a1, a2 = 7938 / 18608, 9240 / 18608, 1430 / 18608
        return (a0 - a1 * np.cos(2 * np.pi * n / length)
                + a2 * np.cos(4 * np.pi * n / length))
