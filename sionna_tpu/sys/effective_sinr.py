"""Effective SINR mapping (reference: src/sionna/sys/
effective_sinr.py:20,84; fresh JAX implementations).

The EESM aggregation is fully vectorized elementwise math + reductions
and jits; beta tables are loaded on host into a NumPy constant.
"""

import json
import os
from abc import abstractmethod

import numpy as np

import jax.numpy as jnp

from ..phy.block import Block
from ..phy.utils.misc import (DeepUpdateDict, dict_keys_to_int, to_list,
                              db_to_lin, scalar_to_shaped_tensor)
from ..phy.utils.tensors import (expand_to_rank,
                                 gather_from_batched_indices)

__all__ = ["EffectiveSINR", "EESM"]

_ESM_DIR = os.path.join(os.path.dirname(__file__), "esm_params")


class EffectiveSINR(Block):
    """Template for effective SINR computation across subcarriers and
    streams (reference effective_sinr.py:20).

    Input sinr: [..., num_ofdm_symbols, num_subcarriers, num_ut,
    num_streams_per_ut] (0 marks an unused stream).  Output:
    [..., num_ut] or, with per_stream=True, [..., num_ut, streams]."""

    def calibrate(self):
        """Optional calibration hook"""

    @abstractmethod
    def call(self, sinr, mcs_index=None, mcs_table_index=None,
             mcs_category=None, per_stream=False, **kwargs):
        ...


class EESM(EffectiveSINR):
    """Exponential effective SINR mapping (EESM)
    (reference effective_sinr.py:84).

    sinr_eff = -beta * log(mean(exp(-sinr / beta))) over utilized
    resources, with beta from per-(table, MCS) calibration tables.
    """

    def __init__(self, load_beta_table_from="default",
                 sinr_eff_min_db=-30, sinr_eff_max_db=30,
                 precision=None):
        super().__init__(precision=precision)
        self._sinr_eff_min = float(db_to_lin(sinr_eff_min_db))
        self._sinr_eff_max = float(db_to_lin(sinr_eff_max_db))
        self._beta_table = None
        self._beta_tensor = None
        if load_beta_table_from == "default":
            self.beta_table_filenames = os.path.join(
                _ESM_DIR, "eesm_beta_table.json")
        else:
            self.beta_table_filenames = load_beta_table_from

    @property
    def beta_table(self):
        """dict: beta_table['index'][mcs_table_index] -> [beta per
        MCS]"""
        return self._beta_table

    @property
    def beta_tensor(self):
        """[n_tables, n_mcs] NumPy array mirror of beta_table"""
        return self._beta_tensor

    @property
    def beta_table_filenames(self):
        return self._beta_table_filenames

    @beta_table_filenames.setter
    def beta_table_filenames(self, value):
        self._beta_table_filenames = to_list(value)
        self._beta_table = DeepUpdateDict({})
        for f in self._beta_table_filenames:
            with open(f, encoding="utf-8") as fh:
                subtable = json.load(fh, object_hook=dict_keys_to_int)
            self._beta_table.deep_update(subtable)
        if self._beta_table == {}:
            raise ValueError("No EESM beta parameter table found.")
        self.validate_beta_table()

        table_idx_vec = list(self._beta_table["index"].keys())
        n_mcs = max(len(self._beta_table["index"][t])
                    for t in table_idx_vec)
        beta = np.zeros([max(table_idx_vec), n_mcs], self.np_rdtype)
        for t in table_idx_vec:
            v = self._beta_table["index"][t]
            beta[t - 1, :len(v)] = v
        self._beta_tensor = beta

    def validate_beta_table(self):
        """Validates the structure of ``beta_table``."""
        if not isinstance(self._beta_table, dict):
            raise ValueError("Must be a dictionary")
        if "index" not in self._beta_table:
            raise ValueError("Key must be 'index'")
        for t, v in self._beta_table["index"].items():
            if not isinstance(v, list):
                raise ValueError(
                    f"beta_table['index'][{t}] must be a list")
        return True

    def call(self, sinr, mcs_index, mcs_table_index=1,
             mcs_category=None, per_stream=False, **kwargs):
        sinr = jnp.asarray(sinr, self.rdtype)
        num_ut = sinr.shape[-2]
        batch_dims = sinr.shape[:-4]
        nb = len(batch_dims)
        mcs_index = scalar_to_shaped_tensor(
            mcs_index, jnp.int32, batch_dims + (num_ut,))
        mcs_table_index = scalar_to_shaped_tensor(
            mcs_table_index, jnp.int32, batch_dims + (num_ut,))

        # [..., ut, streams, sym, sc]
        sinr = jnp.transpose(
            sinr, tuple(range(nb)) + (nb + 2, nb + 3, nb, nb + 1))
        axis = (-2, -1) if per_stream else (-3, -2, -1)

        num_used = jnp.sum((sinr > 0).astype(self.rdtype), axis=axis)
        mcs_index = jnp.maximum(mcs_index, 0)

        idx = jnp.stack([mcs_table_index - 1, mcs_index], axis=-1)
        beta = gather_from_batched_indices(
            jnp.asarray(self._beta_tensor, self.rdtype), idx)

        beta_e = expand_to_rank(beta, sinr.ndim, axis=-1)
        sinr_exp = jnp.where(sinr > 0, jnp.exp(-sinr / beta_e), 0.)

        num_used_safe = jnp.maximum(num_used, 1.)
        mean_exp = jnp.sum(sinr_exp, axis=axis) / num_used_safe
        log_mean = jnp.log(jnp.maximum(mean_exp, 1e-38))
        beta_e2 = expand_to_rank(beta, log_mean.ndim, axis=-1)
        sinr_eff = -beta_e2 * log_mean

        sinr_eff = jnp.where(num_used > 0, sinr_eff, 0.)
        sinr_eff = jnp.clip(sinr_eff, None, self._sinr_eff_max)
        sinr_eff = jnp.where(
            (sinr_eff > 0) & (sinr_eff < self._sinr_eff_min),
            self._sinr_eff_min, sinr_eff)
        return sinr_eff
