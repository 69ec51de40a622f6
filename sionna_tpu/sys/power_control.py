"""Transmit power control (reference: src/sionna/sys/
power_control.py:15,161; fresh JAX implementations).

Both procedures are pure JAX: the downlink fair allocation solves its
KKT system with the batched ``bisection_method`` (lax loops), so it
jits and runs on TPU.
"""

import jax.numpy as jnp

from ..phy.config import config, dtypes
from ..phy.utils.misc import (scalar_to_shaped_tensor, lin_to_db,
                              dbm_to_watt)
from ..phy.utils.numerics import bisection_method

__all__ = ["open_loop_uplink_power_control",
           "downlink_fair_power_control"]


def _rdtype(precision):
    return config.rdtype if precision is None \
        else dtypes[precision]["jax"]["rdtype"]


def open_loop_uplink_power_control(pathloss,
                                   num_allocated_subcarriers,
                                   alpha=1., p0_dbm=-90.,
                                   ut_max_power_dbm=26.,
                                   precision=None):
    """Open-loop uplink power control per TS 38.213 Sec. 7.1.1:
    P = min{P0 + alpha*PL + 10 log10(#PRB), Pmax} [dBm]
    (reference power_control.py:15).  Returns power [W] per user."""
    rdtype = _rdtype(precision)
    pathloss = jnp.asarray(pathloss, rdtype)
    pathloss_db = lin_to_db(pathloss, precision=precision)
    alpha = jnp.asarray(alpha, rdtype)
    p0_dbm = jnp.asarray(p0_dbm, rdtype)
    ut_max_power_dbm = jnp.asarray(ut_max_power_dbm, rdtype)

    num_prb = jnp.ceil(
        jnp.asarray(num_allocated_subcarriers, rdtype) / 12.)
    tx_power = jnp.where(
        num_prb > 0,
        dbm_to_watt(p0_dbm + alpha * pathloss_db
                    + lin_to_db(jnp.maximum(num_prb, 1.),
                                precision=precision),
                    precision=precision),
        0.)
    return jnp.minimum(tx_power,
                       dbm_to_watt(ut_max_power_dbm,
                                   precision=precision))


def downlink_fair_power_control(pathloss, interference_plus_noise,
                                num_allocated_re,
                                bs_max_power_dbm=56.,
                                guaranteed_power_ratio=0.5,
                                fairness=0., return_lagrangian=False,
                                precision=None, **kwargs):
    """Fair downlink power allocation maximizing sum g^(f)(r log(1 +
    p q)) under a total-power budget and per-user guaranteed power
    (reference power_control.py:161).

    Returns (tx_power [..., num_ut] in Watt, utility [..., num_ut]
    [, mu_inv_star])."""
    rdtype = _rdtype(precision)
    pathloss = jnp.asarray(pathloss, rdtype)
    batch_size, num_ut = pathloss.shape[:-1], pathloss.shape[-1]
    fairness = float(fairness)
    if fairness < 0:
        raise ValueError("fairness parameter must be non-negative")
    if not 0. <= guaranteed_power_ratio <= 1.:
        raise ValueError("guaranteed_power_ratio must be in [0;1]")

    num_allocated_re = scalar_to_shaped_tensor(
        num_allocated_re, rdtype, batch_size + (num_ut,))
    interference_plus_noise = jnp.asarray(interference_plus_noise,
                                          rdtype)
    max_power_bs = dbm_to_watt(bs_max_power_dbm, precision=precision)
    max_power_bs = scalar_to_shaped_tensor(max_power_bs, rdtype,
                                           batch_size)
    max_power_bs = jnp.where(
        jnp.sum(num_allocated_re, axis=-1) > 0, max_power_bs, 0.)

    # Per-resource power bounds
    num_scheduled = jnp.sum((num_allocated_re > 0).astype(rdtype),
                            axis=-1)
    p_left = (guaranteed_power_ratio * max_power_bs
              / jnp.maximum(num_scheduled, 1.))[..., None]
    safe_re = jnp.maximum(num_allocated_re, 1.)
    p_left = jnp.where(num_allocated_re > 0, p_left / safe_re, 0.)
    p_right = jnp.where(num_allocated_re > 0,
                        max_power_bs[..., None] / safe_re, 0.)

    # Channel quality q = 1 / (PL * (I+N))
    cq = 1. / (pathloss * interference_plus_noise)

    def kkt_fun(p, mu_inv, cq, num_resources):
        if fairness == 0:
            return cq * mu_inv[..., None] - (1. + p * cq)
        log_pow = jnp.power(
            num_resources * jnp.log(1. + p * cq), fairness)
        return cq * mu_inv[..., None] - log_pow * (1. + p * cq)

    def get_p_star_mu(mu_inv):
        if fairness == 0:
            return jnp.maximum(mu_inv[..., None] - 1. / cq, p_left)
        p_star, _ = bisection_method(
            kkt_fun, p_left, p_right, expand_to_right=False,
            expand_to_left=False, regula_falsi=False, mu_inv=mu_inv,
            cq=cq, num_resources=num_allocated_re,
            precision=precision, **kwargs)
        return p_star

    def constraint_slackness(mu_inv):
        p_star = get_p_star_mu(mu_inv)
        return max_power_bs - jnp.sum(num_allocated_re * p_star,
                                      axis=-1)

    mu_inv_left = jnp.zeros(batch_size, rdtype)
    mu_inv_right = jnp.full(batch_size, 1000., rdtype)
    mu_inv_star, _ = bisection_method(
        constraint_slackness, mu_inv_left, mu_inv_right,
        expand_to_right=True, expand_to_left=False,
        regula_falsi=False, precision=precision, **kwargs)

    p_star = get_p_star_mu(mu_inv_star)
    # Total power per user across its resources
    tx_power = p_star * num_allocated_re
    # Utility per user: r * log(1 + P q) where P is the user's TOTAL
    # power — matching the reference convention
    # (power_control.py:539-546 multiplies by num_allocated_re before
    # the utility log), not the per-resource p of the docstring's
    # optimization problem.
    utility = num_allocated_re * jnp.log(1. + tx_power * cq)

    if return_lagrangian:
        return tx_power, utility, mu_inv_star
    return tx_power, utility
