"""Signal utilities: convolution, normalized (I)DFT, empirical PSD/ACLR
(reference: src/sionna/phy/signal/utils.py:13,161,206,251,317; fresh
JAX implementations).

Convolution maps to a single batched ``lax.conv_general_dilated``
(complex handled via real/imag decomposition - 4 real convolutions
fused by XLA).
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..config import config, dtypes

__all__ = ["convolve", "fft", "ifft", "empirical_psd", "empirical_aclr"]


def _conv1d_real(x, ker):
    """Real 1D convolution (true convolution, kernel flipped), 'full'
    output length N+K-1. x: [B, N], ker: [K]."""
    k = ker.shape[0]
    x = x[:, None, :]  # [B, C=1, W]
    kflip = ker[::-1][None, None, :]  # [O=1, I=1, W]
    out = jax.lax.conv_general_dilated(
        x, kflip, window_strides=(1,), padding=[(k - 1, k - 1)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    return out[:, 0, :]


def convolve(inp, ker, padding="full", axis=-1, precision=None):
    """Convolves ``inp`` with ``ker`` along ``axis``.

    padding: "full" (N+K-1) | "same" (N, centered on (K-1)//2) |
    "valid" (N-K+1).
    """
    padding = padding.lower()
    if padding not in ("valid", "same", "full"):
        raise ValueError("Invalid padding method")
    if precision is None:
        rdtype = config.rdtype
        cdtype = config.cdtype
    else:
        rdtype = dtypes[precision]["jax"]["rdtype"]
        cdtype = dtypes[precision]["jax"]["cdtype"]

    inp = jnp.asarray(inp)
    ker = jnp.asarray(ker)
    complex_out = (jnp.issubdtype(inp.dtype, jnp.complexfloating)
                   or jnp.issubdtype(ker.dtype, jnp.complexfloating))
    inp = inp.astype(cdtype if jnp.issubdtype(inp.dtype,
                                              jnp.complexfloating)
                     else rdtype)
    ker = ker.astype(cdtype if jnp.issubdtype(ker.dtype,
                                              jnp.complexfloating)
                     else rdtype)

    inp = jnp.moveaxis(inp, axis, -1)
    batch_shape = inp.shape[:-1]
    n = inp.shape[-1]
    k = ker.shape[0]
    x = jnp.reshape(inp, (-1, n))

    if complex_out:
        xr = jnp.real(x).astype(rdtype)
        xi = jnp.imag(x).astype(rdtype)
        kr = jnp.real(ker).astype(rdtype)
        ki = jnp.imag(ker).astype(rdtype)
        rr = _conv1d_real(xr, kr)
        ii = _conv1d_real(xi, ki)
        ri = _conv1d_real(xr, ki)
        ir = _conv1d_real(xi, kr)
        out = (rr - ii) + 1j * (ri + ir)
        out = out.astype(cdtype)
    else:
        out = _conv1d_real(x, ker)

    # crop 'full' output per padding mode
    if padding == "same":
        start = (k - 1) // 2
        out = out[:, start:start + n]
    elif padding == "valid":
        out = out[:, k - 1:k - 1 + max(n - k + 1, 0)]

    out = jnp.reshape(out, batch_shape + (out.shape[-1],))
    return jnp.moveaxis(out, -1, axis)


def fft(tensor, axis=-1, precision=None):
    """Normalized DFT: scaled by 1/sqrt(N) (reference utils.py:161)."""
    cdtype = config.cdtype if precision is None \
        else dtypes[precision]["jax"]["cdtype"]
    tensor = jnp.asarray(tensor, cdtype)
    n = tensor.shape[axis]
    scale = 1 / jnp.sqrt(jnp.asarray(n, cdtype))
    return scale * jnp.fft.fft(tensor, axis=axis).astype(cdtype)


def ifft(tensor, axis=-1, precision=None):
    """Normalized IDFT: scaled by sqrt(N) (reference utils.py:206)."""
    cdtype = config.cdtype if precision is None \
        else dtypes[precision]["jax"]["cdtype"]
    tensor = jnp.asarray(tensor, cdtype)
    n = tensor.shape[axis]
    scale = jnp.sqrt(jnp.asarray(n, cdtype))
    return scale * jnp.fft.ifft(tensor, axis=axis).astype(cdtype)


def empirical_psd(x, show=True, oversampling=1.0, ylim=(-30, 3),
                  precision=None):
    """Empirical power spectral density via the periodogram
    (reference utils.py:251). Returns (freqs, psd)."""
    rdtype = config.rdtype if precision is None \
        else dtypes[precision]["jax"]["rdtype"]
    x = jnp.asarray(x)
    x = jnp.reshape(x, (-1, x.shape[-1]))
    n = x.shape[-1]
    spec = jnp.fft.fftshift(jnp.fft.fft(x, axis=-1), axes=-1)
    psd = jnp.mean(jnp.abs(spec) ** 2, axis=0) / n
    psd = psd.astype(rdtype)
    freqs = jnp.fft.fftshift(jnp.fft.fftfreq(n)) * oversampling
    freqs = freqs.astype(rdtype)
    if show:
        import matplotlib.pyplot as plt
        plt.figure()
        plt.plot(np.asarray(freqs),
                 10 * np.log10(np.maximum(np.asarray(psd), 1e-12)))
        plt.title("Power Spectral Density")
        plt.xlabel("Normalized Frequency")
        plt.ylabel(r"$\mathbb{E}\left[|X(f)|^2\right]$ (dB)")
        plt.ylim(ylim)
        plt.grid(True, which="both")
    return freqs, psd


def empirical_aclr(x, oversampling=1.0, f_min=-0.5, f_max=0.5,
                   precision=None):
    """Empirical adjacent channel leakage ratio: out-of-band power over
    in-band power, where the band is [f_min, f_max]
    (reference utils.py:317)."""
    freqs, psd = empirical_psd(x, oversampling=oversampling, show=False,
                               precision=precision)
    in_band = jnp.logical_and(freqs >= f_min, freqs <= f_max)
    p_in = jnp.sum(jnp.where(in_band, psd, 0))
    p_out = jnp.sum(jnp.where(in_band, 0, psd))
    return p_out / p_in
