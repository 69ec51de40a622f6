"""Scheduling (reference: src/sionna/sys/scheduling.py:14; fresh JAX
implementation)."""

import numpy as np

import jax.numpy as jnp

from ..phy.block import Block

__all__ = ["PFSchedulerSUMIMO"]


class PFSchedulerSUMIMO(Block):
    """Proportional-fairness scheduler for SU-MIMO: each
    time-frequency resource goes to the user maximizing
    achievable_rate / discounted_past_rate
    (reference scheduling.py:14).

    Call: (rate_last_slot [batch, num_ut],
    rate_achievable_curr_slot [batch, num_ofdm_sym, num_freq_res,
    num_ut]) -> is_scheduled [batch, num_ofdm_sym, num_freq_res,
    num_ut, num_streams_per_ut] bool.
    """

    def __init__(self, num_ut, num_freq_res, num_ofdm_sym,
                 batch_size=None, num_streams_per_ut=1, beta=.98,
                 precision=None):
        super().__init__(precision=precision)
        if batch_size is None:
            batch_size = []
        elif isinstance(batch_size, int):
            batch_size = [batch_size]
        else:
            batch_size = list(batch_size)
        self._batch_size = batch_size
        self._num_ut = int(num_ut)
        self._num_freq_res = int(num_freq_res)
        self._num_ofdm_sym = int(num_ofdm_sym)
        self._num_streams_per_ut = int(num_streams_per_ut)
        self.beta = beta
        self._rate_achieved_past = np.ones(
            batch_size + [num_ut], self.np_rdtype)
        self._pf_metric = np.zeros(
            batch_size + [num_ofdm_sym, num_freq_res, num_ut],
            self.np_rdtype)

    @property
    def rate_achieved_past(self):
        """[batch, num_ut] beta-discounted average achieved rate"""
        return self._rate_achieved_past

    @property
    def pf_metric(self):
        """[batch, sym, freq_res, num_ut] last-slot PF metric"""
        return self._pf_metric

    @property
    def beta(self):
        return self._beta

    @beta.setter
    def beta(self, value):
        if not 0. < value < 1.:
            raise ValueError(
                "Discount factor 'beta' must be within (0;1)")
        self._beta = float(value)

    def call(self, rate_last_slot, rate_achievable_curr_slot):
        rate_last_slot = np.asarray(rate_last_slot, self.np_rdtype)
        rate_achievable = np.asarray(rate_achievable_curr_slot,
                                     self.np_rdtype)
        expected_last = tuple(self._batch_size) + (self._num_ut,)
        if rate_last_slot.shape != expected_last:
            raise ValueError("Inconsistent 'rate_last_slot' shape")
        expected_ach = tuple(self._batch_size) + (
            self._num_ofdm_sym, self._num_freq_res, self._num_ut)
        if rate_achievable.shape != expected_ach:
            raise ValueError(
                "Inconsistent 'rate_achievable_curr_slot' shape")

        # beta-discounted throughput update
        self._rate_achieved_past = (
            self._beta * self._rate_achieved_past
            + (1 - self._beta) * rate_last_slot)
        past = self._rate_achieved_past[..., None, None, :]

        self._pf_metric = rate_achievable / past

        scheduled_ut = np.argmax(self._pf_metric, axis=-1)
        is_scheduled = (scheduled_ut[..., None]
                        == np.arange(self._num_ut))
        is_scheduled = np.repeat(is_scheduled[..., None],
                                 self._num_streams_per_ut, axis=-1)
        return jnp.asarray(is_scheduled)
