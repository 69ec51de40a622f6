"""Propagation-path container (API parity with sionna.rt.Paths, see
SURVEY.md 2.12)."""

import numpy as np

import jax.numpy as jnp

from ..phy.constants import PI
from .geometry import host_real_dtype

__all__ = ["Paths"]


class Paths:
    """Propagation paths (API parity with sionna.rt.Paths).

    a : [num_rx, num_rx_ant, num_tx, num_tx_ant, num_paths] complex
        path coefficients (without Doppler)
    tau : [num_rx, num_tx, num_paths] delays [s]

    Fields are host NumPy arrays: the solver's device stages return
    complex results as (re, im) float pairs because complex arrays
    cannot cross the TPU transfer boundary; CIR assembly is cheap
    host math."""

    def __init__(self, a, tau, valid, theta_t, phi_t, theta_r, phi_r,
                 doppler, interactions, types=None):
        self.a = a
        self.tau = tau
        self.valid = valid
        self.theta_t = theta_t
        self.phi_t = phi_t
        self.theta_r = theta_r
        self.phi_r = phi_r
        self.doppler = doppler
        self.interactions = interactions
        # [num_paths] interaction type per path: 0 LoS, 1 specular,
        # 2 diffracted, 3 scattered (upstream InteractionType codes)
        self.types = (types if types is not None
                      else np.zeros(self.a.shape[-1], np.int32))

    @property
    def num_paths(self):
        return self.a.shape[-1]

    def cir(self, sampling_frequency=None, num_time_steps=1,
            normalize_delays=False, out_type="jax"):
        """Channel impulse response with Doppler evolution.

        Returns (a [num_rx, num_rx_ant, num_tx, num_tx_ant,
        num_paths, num_time_steps], tau [num_rx, num_tx,
        num_paths])."""
        if sampling_frequency is None:
            sampling_frequency = 1.
        t = np.arange(num_time_steps) / sampling_frequency
        doppler = np.asarray(self.doppler)
        phase = np.exp(2j * PI * doppler[..., None] * t)  # [rx,tx,P,T]
        a = (np.asarray(self.a)[..., None]
             * phase[:, None, :, None, :, :]).astype(np.complex64)
        tau = np.asarray(self.tau)
        valid = np.asarray(self.valid)
        if normalize_delays:
            tau_min = np.min(
                np.where(valid, tau, np.inf), axis=-1, keepdims=True)
            tau_min = np.where(np.isfinite(tau_min), tau_min, 0.)
            tau = np.where(valid, tau - tau_min, tau)
        if out_type == "numpy":
            return a, tau
        return jnp.asarray(a), jnp.asarray(
            tau.astype(host_real_dtype()))

    def cfr(self, frequencies, sampling_frequency=None,
            num_time_steps=1, normalize_delays=False,
            normalize=False, out_type="jax"):
        """Channel frequency response at baseband ``frequencies``
        (upstream Paths.cfr; used e.g. in the reference's
        SYS_Meets_RT tutorial):

        h[..., t, f] = sum_p a_p(t) exp(-2j pi f tau_p)

        Returns [num_rx, num_rx_ant, num_tx, num_tx_ant,
        num_time_steps, num_freqs]."""
        from ..phy.channel.utils import cir_to_ofdm_channel
        a, tau = self.cir(sampling_frequency=sampling_frequency,
                          num_time_steps=num_time_steps,
                          normalize_delays=normalize_delays,
                          out_type="numpy")
        # cir_to_ofdm_channel expects batched [b, rx, rxa, tx, txa,
        # P, T] with tau [b, rx, tx, P]
        h = cir_to_ofdm_channel(np.asarray(frequencies), a[None],
                                tau[None], normalize=normalize)
        # [1, rx, rxa, tx, txa, T, F] -> drop batch
        h = np.asarray(h)[0]
        if out_type == "numpy":
            return h
        return jnp.asarray(h)

    def taps(self, bandwidth, l_min, l_max, sampling_frequency=None,
             num_time_steps=1, normalize=False,
             normalize_delays=True, out_type="jax"):
        """Bandlimited discrete-time channel taps (upstream
        Paths.taps): sinc-reconstructed taps at lags l_min..l_max for
        a system of ``bandwidth`` Hz.

        Returns [num_rx, num_rx_ant, num_tx, num_tx_ant,
        num_time_steps, l_max - l_min + 1]."""
        from ..phy.channel.utils import cir_to_time_channel
        a, tau = self.cir(sampling_frequency=sampling_frequency,
                          num_time_steps=num_time_steps,
                          normalize_delays=normalize_delays,
                          out_type="numpy")
        hm = cir_to_time_channel(bandwidth, a[None], tau[None],
                                 l_min, l_max, normalize=normalize)
        hm = np.asarray(hm)[0]
        if out_type == "numpy":
            return hm
        return jnp.asarray(hm)
