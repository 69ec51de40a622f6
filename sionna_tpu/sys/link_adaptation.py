"""Link adaptation (reference: src/sionna/sys/link_adaptation.py:17,
267; fresh JAX implementations).

ILLA is stateless and jittable.  OLLA keeps its SINR-offset state as
host arrays (a slot-level control loop); each call returns the updated
MCS selection.  For TPU-resident slot loops, ``OLLA.init_state`` /
``OLLA.step`` expose the same update as a pure function whose state is
a scan carry — an entire multi-slot adaptation loop then compiles to
one XLA program (one device launch) instead of per-slot round trips.
"""

import numpy as np

import jax.numpy as jnp

from ..phy.block import Block
from ..phy.utils.misc import (scalar_to_shaped_tensor,
                              db_to_lin)
from ..phy.utils.tensors import (find_true_position,
                                 tensor_values_are_in_set)
from .utils import is_scheduled_in_slot

__all__ = ["InnerLoopLinkAdaptation", "OuterLoopLinkAdaptation"]


class InnerLoopLinkAdaptation(Block):
    """Inner-loop link adaptation (ILLA): highest MCS with TBLER <=
    bler_target (reference link_adaptation.py:17)."""

    def __init__(self, phy_abstraction, bler_target=0.1,
                 fill_mcs_value=0):
        super().__init__(precision=phy_abstraction.precision)
        self._phy_abstraction = phy_abstraction
        self._fill_mcs_value = int(fill_mcs_value)
        self.bler_target = bler_target

    @property
    def bler_target(self):
        return self._bler_target

    @bler_target.setter
    def bler_target(self, value):
        self._bler_target = float(value)

    def call(self, sinr=None, sinr_eff=None, num_allocated_re=None,
             mcs_table_index=1, mcs_category=0,
             return_lowest_available_mcs=False, **kwargs):
        if not ((sinr is not None)
                ^ ((sinr_eff is not None)
                   and (num_allocated_re is not None))):
            raise ValueError(
                "Either 'sinr' or ('sinr_eff','num_allocated_re') is "
                "required as input")

        num_mcs = self._phy_abstraction.bler_table_interp.shape[2]
        ut_is_scheduled = is_scheduled_in_slot(
            sinr=sinr, num_allocated_re=num_allocated_re)

        if sinr is not None:
            sinr = jnp.asarray(sinr, self.rdtype)
            batch_dims = sinr.shape[:-4]
            num_ut = sinr.shape[-2]
        else:
            sinr_eff = jnp.asarray(sinr_eff, self.rdtype)
            batch_dims = sinr_eff.shape[:-1]
            num_ut = sinr_eff.shape[-1]
        nb = len(batch_dims)

        # Tile all inputs along a new MCS axis at -2 (before num_ut)
        mcs_index_all = jnp.arange(num_mcs, dtype=jnp.int32)
        mcs_index_all = jnp.broadcast_to(
            mcs_index_all[..., None],
            batch_dims + (num_mcs, num_ut))

        mcs_table_index = scalar_to_shaped_tensor(
            mcs_table_index, jnp.int32, batch_dims + (num_ut,))
        mcs_table_index = jnp.broadcast_to(
            mcs_table_index[..., None, :],
            batch_dims + (num_mcs, num_ut))
        mcs_category = scalar_to_shaped_tensor(
            mcs_category, jnp.int32, batch_dims + (num_ut,))
        mcs_category = jnp.broadcast_to(
            mcs_category[..., None, :],
            batch_dims + (num_mcs, num_ut))

        if num_allocated_re is not None:
            num_allocated_re = jnp.asarray(num_allocated_re, jnp.int32)
            num_allocated_re = jnp.broadcast_to(
                num_allocated_re[..., None, :],
                batch_dims + (num_mcs, num_ut))
        if sinr is not None:
            sinr = jnp.broadcast_to(
                sinr[..., None, :, :, :, :],
                batch_dims + (num_mcs,) + sinr.shape[nb:])
        else:
            sinr_eff = jnp.broadcast_to(
                sinr_eff[..., None, :],
                batch_dims + (num_mcs, num_ut))

        *_, tbler_per_mcs, _ = self._phy_abstraction(
            mcs_index_all, sinr=sinr, sinr_eff=sinr_eff,
            num_allocated_re=num_allocated_re,
            mcs_table_index=mcs_table_index,
            mcs_category=mcs_category,
            check_mcs_index_validity=False)

        # Highest MCS with TBLER <= target (-1 if none)
        mcs_index = find_true_position(
            tbler_per_mcs <= self.bler_target, side="last", axis=-2)
        lowest_available = find_true_position(
            (tbler_per_mcs >= 0) & (tbler_per_mcs <= 1), side="first",
            axis=-2)
        mcs_index = jnp.where(mcs_index != -1, mcs_index,
                              lowest_available)
        mcs_index = jnp.where(ut_is_scheduled, mcs_index,
                              self._fill_mcs_value)
        if return_lowest_available_mcs:
            return mcs_index, lowest_available
        return mcs_index


class OuterLoopLinkAdaptation(Block):
    """Outer-loop link adaptation (OLLA): ILLA on HARQ-adjusted SINR
    offset per [Pedersen05]/[Sampath97]
    (reference link_adaptation.py:267)."""

    def __init__(self, phy_abstraction, num_ut, bler_target=0.1,
                 delta_up=1., batch_size=None, sinr_eff_init=1.,
                 sinr_eff_init_fill=1., offset_min=-20.,
                 offset_max=20.):
        super().__init__(precision=phy_abstraction.precision)
        if sinr_eff_init_fill <= 0:
            raise ValueError("'sinr_eff_init_fill' must be positive")
        if batch_size is None:
            batch_size = []
        elif isinstance(batch_size, int):
            batch_size = [batch_size]
        else:
            batch_size = list(batch_size)

        self._batch_size = batch_size
        self._num_ut = int(num_ut)
        self._phy_abstraction = phy_abstraction
        self._illa = InnerLoopLinkAdaptation(phy_abstraction,
                                             bler_target=bler_target)
        self._bler_target = float(bler_target)
        self._delta_up = float(delta_up)
        self._offset_min = float(offset_min)
        self._offset_max = float(offset_max)
        self._illa_jit = None
        self.reset(sinr_eff_init, sinr_eff_init_fill)

    def reset(self, sinr_eff_init=1., sinr_eff_init_fill=.1):
        """Resets ``sinr_eff_db_last`` and ``offset``."""
        shape = tuple(self._batch_size) + (self._num_ut,)
        sinr_eff_init = np.broadcast_to(
            np.asarray(sinr_eff_init, self.np_rdtype), shape)
        self._sinr_eff_db_last = np.where(
            sinr_eff_init > 0,
            10. * np.log10(np.maximum(sinr_eff_init, 1e-30)),
            10. * np.log10(sinr_eff_init_fill)).astype(self.np_rdtype)
        self._offset = np.zeros(shape, self.np_rdtype)

    @property
    def offset(self):
        """[..., num_ut] current SINR offset [dB]"""
        return self._offset

    @property
    def offset_min(self):
        return self._offset_min

    @offset_min.setter
    def offset_min(self, value):
        self._offset_min = float(value)

    @property
    def offset_max(self):
        return self._offset_max

    @offset_max.setter
    def offset_max(self, value):
        self._offset_max = float(value)

    @property
    def bler_target(self):
        return self._bler_target

    @bler_target.setter
    def bler_target(self, value):
        self._bler_target = float(value)
        self._illa.bler_target = float(value)

    @property
    def sinr_eff_db_last(self):
        """[..., num_ut] last observed effective SINR [dB]"""
        return self._sinr_eff_db_last

    @sinr_eff_db_last.setter
    def sinr_eff_db_last(self, value):
        self._sinr_eff_db_last = np.asarray(value, self.np_rdtype)

    @property
    def delta_up(self):
        return self._delta_up

    @delta_up.setter
    def delta_up(self, value):
        if value <= 0:
            raise ValueError("'delta_up' must be positive")
        self._delta_up = float(value)

    @property
    def delta_down(self):
        """delta_up * bler_target / (1 - bler_target)"""
        return (self._delta_up * self._bler_target
                / (1. - self._bler_target))

    def call(self, num_allocated_re, harq_feedback=None, sinr_eff=None,
             mcs_table_index=1, mcs_category=0):
        num_allocated_re = np.asarray(num_allocated_re)
        shape = num_allocated_re.shape
        if harq_feedback is None:
            harq_feedback = np.full(shape, -1, np.int32)
        else:
            harq_feedback = np.asarray(harq_feedback, np.int32)
        if not bool(tensor_values_are_in_set(harq_feedback,
                                             [-1, 0, 1])):
            raise ValueError("'harq_feedback' must contain values in "
                             "[-1 (N/A), 0 (NACK), 1 (ACK)]")
        if sinr_eff is None:
            sinr_eff = np.zeros(shape, self.np_rdtype)
        else:
            sinr_eff = np.asarray(sinr_eff, self.np_rdtype)

        # Update offset from HARQ feedback, clipped to bounds
        self._offset = np.where(
            harq_feedback == 1, self._offset - self.delta_down,
            np.where(harq_feedback == 0, self._offset + self._delta_up,
                     self._offset))
        self._offset = np.clip(self._offset, self._offset_min,
                               self._offset_max)

        # Update last observed effective SINR
        self._sinr_eff_db_last = np.where(
            sinr_eff > 0,
            10. * np.log10(np.maximum(sinr_eff, 1e-30)),
            self._sinr_eff_db_last).astype(self.np_rdtype)

        sinr_eff_offset = 10. ** (
            (self._sinr_eff_db_last - self._offset) / 10.)
        # the inner-loop search runs as one jitted program (cached on
        # first use): on accelerators this replaces dozens of eager
        # dispatches per slot with a single launch
        if self._illa_jit is None:
            import jax

            def _run(sinr_eff, n_re, ti, cat):
                return self._illa(sinr_eff=sinr_eff,
                                  num_allocated_re=n_re,
                                  mcs_table_index=ti,
                                  mcs_category=cat)
            self._illa_jit = jax.jit(_run)
        return self._illa_jit(
            jnp.asarray(sinr_eff_offset, self.rdtype),
            jnp.asarray(num_allocated_re, jnp.int32),
            jnp.asarray(mcs_table_index, jnp.int32),
            jnp.asarray(mcs_category, jnp.int32))

    # ------------------------------------------------------------------
    # Functional (scan-fusable) API
    # ------------------------------------------------------------------
    def init_state(self):
        """OLLA state as a pytree of device arrays for :meth:`step`:
        ``(offset [..., num_ut], sinr_eff_db_last [..., num_ut])``.
        Seeds from the current host-side state (so ``reset`` /
        ``sinr_eff_db_last=...`` still control initialization)."""
        return (jnp.asarray(self._offset, self.rdtype),
                jnp.asarray(self._sinr_eff_db_last, self.rdtype))

    def step(self, state, num_allocated_re, harq_feedback=None,
             sinr_eff=None, mcs_table_index=1, mcs_category=0):
        """One OLLA slot update as a PURE function of ``state`` — the
        TPU-native hot path: traceable under ``jax.jit`` /
        ``lax.scan``, so a whole multi-slot link-adaptation loop
        (OLLA -> ILLA -> PHY abstraction -> HARQ) compiles to ONE
        program instead of one host round trip per slot.  Numerics
        match :meth:`call` exactly (same offset update, SINR tracking
        and ILLA search).

        state : ``(offset, sinr_eff_db_last)`` from
            :meth:`init_state` or a previous ``step``.
        harq_feedback : [..., num_ut] in {-1 (N/A), 0 (NACK),
            1 (ACK)}; values are not validated under trace.

        Returns ``((offset, sinr_eff_db_last), mcs_index)``.
        """
        offset, sinr_db_last = state
        n_re = jnp.asarray(num_allocated_re, jnp.int32)
        if harq_feedback is None:
            harq_feedback = jnp.full(offset.shape, -1, jnp.int32)
        else:
            harq_feedback = jnp.asarray(harq_feedback, jnp.int32)

        offset = jnp.where(
            harq_feedback == 1, offset - self.delta_down,
            jnp.where(harq_feedback == 0, offset + self._delta_up,
                      offset))
        offset = jnp.clip(offset, self._offset_min, self._offset_max)

        if sinr_eff is not None:
            sinr_eff = jnp.asarray(sinr_eff, self.rdtype)
            sinr_db_last = jnp.where(
                sinr_eff > 0,
                10. * jnp.log10(jnp.maximum(sinr_eff, 1e-30)),
                sinr_db_last)

        sinr_eff_offset = 10. ** ((sinr_db_last - offset) / 10.)
        mcs = self._illa(sinr_eff=sinr_eff_offset,
                         num_allocated_re=n_re,
                         mcs_table_index=mcs_table_index,
                         mcs_category=mcs_category)
        return (offset, sinr_db_last), mcs
