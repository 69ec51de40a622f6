"""PUSCH DMRS-aware LS channel estimation with CDM despreading
(reference: src/sionna/phy/nr/pusch_channel_estimation.py:9)."""

import numpy as np

import jax.numpy as jnp

from ..ofdm.channel_estimation import BaseChannelEstimator
from ..utils.tensors import expand_to_rank, split_dim

__all__ = ["PUSCHLSChannelEstimator"]


class PUSCHLSChannelEstimator(BaseChannelEstimator):
    """LS estimation at DMRS positions with time/frequency averaging
    across CDM groups."""

    def __init__(self, resource_grid, dmrs_length,
                 dmrs_additional_position, num_cdm_groups_without_data,
                 interpolation_type="nn", interpolator=None,
                 precision=None, **kwargs):
        super().__init__(resource_grid, interpolation_type,
                         interpolator, precision=precision, **kwargs)
        self._dmrs_length = int(dmrs_length)
        self._dmrs_additional_position = int(dmrs_additional_position)
        self._num_cdm_groups_without_data = int(
            num_cdm_groups_without_data)
        self._num_dmrs_syms = self._dmrs_length \
            * (self._dmrs_additional_position + 1)
        self._num_pilots_per_dmrs_sym = int(
            np.asarray(self._pilot_pattern.pilots).shape[-1]
            / self._num_dmrs_syms)

    def estimate_at_pilot_locations(self, y_pilots, no):
        pilots = jnp.asarray(self._pilot_pattern.pilots, self.cdtype)
        denom = jnp.where(jnp.abs(pilots) == 0,
                          jnp.ones_like(pilots), pilots)
        h_ls = jnp.where(jnp.abs(pilots) == 0,
                         jnp.zeros_like(y_pilots), y_pilots / denom)
        h_ls_shape = h_ls.shape
        no_b = expand_to_rank(jnp.asarray(no, self.rdtype), h_ls.ndim,
                              -1)
        p2 = jnp.abs(pilots) ** 2
        err_var = jnp.where(p2 == 0, jnp.zeros_like(p2),
                            no_b / jnp.maximum(p2, 1e-30))
        err_var = jnp.broadcast_to(err_var, h_ls.shape)

        h_hat = h_ls
        # time-averaging across double-symbol DMRS
        if self._dmrs_length == 2:
            h_hat = split_dim(h_hat, [self._num_dmrs_syms,
                                      self._num_pilots_per_dmrs_sym], 5)
            h_hat = (h_hat[..., 0::2, :] + h_hat[..., 1::2, :]) / 2
            h_hat = jnp.repeat(h_hat, 2, axis=-2)
            h_hat = jnp.reshape(h_hat, h_ls_shape)
            err_var = err_var / 2

        # frequency-averaging across CDM groups
        n = 2 * self._num_cdm_groups_without_data
        k = h_hat.shape[-1] // n
        h_hat = split_dim(h_hat, [k, n], 5)
        cond = jnp.abs(h_hat) > 0
        h_hat = jnp.sum(h_hat, axis=-1, keepdims=True) / 2
        h_hat = jnp.repeat(h_hat, n, axis=-1)
        h_hat = jnp.where(cond, h_hat, 0)
        h_hat = jnp.reshape(h_hat, h_ls_shape)
        err_var = err_var / 2
        return h_hat, err_var
