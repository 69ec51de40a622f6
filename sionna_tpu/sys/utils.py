"""SYS utility functions (reference: src/sionna/sys/utils.py; fresh
JAX implementations)."""

import jax.numpy as jnp

from ..phy.config import config, dtypes
from ..phy.utils.tensors import insert_dims

__all__ = ["is_scheduled_in_slot", "get_pathloss",
           "spread_across_subcarriers"]


def _rdtype(precision):
    return config.rdtype if precision is None \
        else dtypes[precision]["jax"]["rdtype"]


def is_scheduled_in_slot(sinr=None, num_allocated_re=None):
    """Whether each user is scheduled in a slot (reference
    sys/utils.py:13).

    sinr: [..., sym, sc, ut, streams] or num_allocated_re: [..., ut].
    Returns bool [..., ut]."""
    if (sinr is None) == (num_allocated_re is None):
        raise ValueError("Either 'sinr' or 'num_allocated_re' is "
                         "required as input")
    if sinr is not None:
        sinr = jnp.asarray(sinr)
        return jnp.sum(sinr, axis=(-4, -3, -1)) > 0
    return jnp.asarray(num_allocated_re) > 0


def get_pathloss(h_freq, rx_tx_association=None, precision=None):
    """Pathloss per RX-TX pair (and per-user serving link) from OFDM
    channel coefficients (reference sys/utils.py:49).

    h_freq: [..., rx, rxa, tx, txa, sym, sc].
    Returns (pathloss_all_pairs [..., rx, tx, sym],
    pathloss_serving_tx [..., num_ut, sym] or None)."""
    rdtype = _rdtype(precision)
    h_freq = jnp.asarray(h_freq)
    rx_power = jnp.abs(h_freq) ** 2
    # mean over subcarriers, tx ant, rx ant
    rx_power = jnp.mean(rx_power, axis=(-1, -3, -5)).astype(rdtype)
    pathloss_all_pairs = jnp.where(rx_power > 0., 1. / rx_power,
                                   jnp.asarray(jnp.inf, rdtype))

    if rx_tx_association is None:
        return pathloss_all_pairs, None

    import numpy as np
    assoc = np.asarray(rx_tx_association)
    if not np.all(np.isin(assoc, [0, 1])):
        raise ValueError("rx_tx_association must contain binary values")
    rx_idx, tx_idx = np.where(assoc == 1)
    # [..., num_ut, sym]
    pathloss_serving_tx = pathloss_all_pairs[..., rx_idx, tx_idx, :]
    return pathloss_all_pairs, pathloss_serving_tx


def spread_across_subcarriers(tx_power_per_ut, is_scheduled, num_tx=None,
                              precision=None):
    """Uniformly distributes per-user power over its allocated
    subcarriers and streams (reference sys/utils.py:139).

    tx_power_per_ut: [..., sym, ut];
    is_scheduled: [..., sym, sc, ut, streams].
    Returns [..., num_tx, streams_per_tx, sym, sc]."""
    rdtype = _rdtype(precision)
    tx_power_per_ut = jnp.asarray(tx_power_per_ut, rdtype)
    is_scheduled = jnp.asarray(is_scheduled, bool)
    num_sym, num_sc, num_ut, num_streams = is_scheduled.shape[-4:]
    lbs = is_scheduled.ndim - 4
    if num_tx is None:
        num_tx = num_ut

    # [..., sym, ut, sc, streams]
    perm = tuple(range(lbs)) + (lbs, lbs + 2, lbs + 1, lbs + 3)
    is_scheduled = jnp.transpose(is_scheduled, perm)

    tx_power = insert_dims(tx_power_per_ut, 2, axis=-1)
    tx_power = jnp.where(is_scheduled, tx_power, 0.)

    num_allocated_re = jnp.sum(is_scheduled.astype(jnp.int32),
                               axis=(-2, -1))
    num_allocated_re = insert_dims(num_allocated_re, 2, axis=-1)
    tx_power = jnp.where(num_allocated_re > 0,
                         tx_power / num_allocated_re.astype(rdtype), 0.)

    # [..., ut, streams, sym, sc]
    perm = tuple(range(lbs)) + (lbs + 1, lbs + 3, lbs, lbs + 2)
    tx_power = jnp.transpose(tx_power, perm)
    return tx_power.reshape(tx_power.shape[:-4]
                            + (num_tx, -1, num_sym, num_sc))
