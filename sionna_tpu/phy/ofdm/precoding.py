"""OFDM transmit precoding (reference:
src/sionna/phy/ofdm/precoding.py:15,179,375,448,513; fresh JAX
implementations).

All precoders are batched dense linear algebra over
[batch, tx, sym, sc, ant, streams] — pure MXU work under jit.
"""

from abc import abstractmethod

import jax.numpy as jnp

from ..block import Block
from ..utils.tensors import expand_to_rank, flatten_dims
from ..mimo import (StreamManagement, rzf_precoder,
                    rzf_precoding_matrix, cbf_precoding_matrix)
from .resource_grid import ResourceGrid, RemoveNulledSubcarriers

__all__ = ["RZFPrecoder", "PrecodedChannel", "RZFPrecodedChannel",
           "CBFPrecodedChannel", "EyePrecodedChannel"]


def _gather_desired_channels(h_hat, stream_management):
    """[b, rx, rxa, tx, txa, sym, sc] -> desired channels per TX
    [b, tx, sym, sc, num_streams_per_tx, num_tx_ant]."""
    # [tx, rx, rxa, txa, sym, sc, b]
    h_pc = jnp.transpose(h_hat, (3, 1, 2, 4, 5, 6, 0))
    # Per-TX gather of its served RXs
    # precoding_ind: [num_tx, num_rx_per_tx]
    ind = jnp.asarray(stream_management.precoding_ind)
    h_pc_desired = jnp.take_along_axis(
        h_pc, ind[:, :, None, None, None, None, None], axis=1)
    # [tx, rx_per_tx * rxa, txa, sym, sc, b]
    h_pc_desired = flatten_dims(h_pc_desired, 2, axis=1)
    # [b, tx, sym, sc, streams_per_tx, txa]
    return jnp.transpose(h_pc_desired, (5, 0, 3, 4, 1, 2))


def _effective_channel(h, g, remove_nulled_scs, cdtype):
    """h: [b, rx, rxa, tx, txa, sym, sc];
    g: [b, tx, sym, sc, txa, streams] ->
    h_eff: [b, rx, rxa, tx, streams, sym, n_eff_sc]."""
    # [b, rx, tx, sym, sc, rxa, txa]
    h_t = jnp.transpose(h, (0, 1, 3, 5, 6, 2, 4)).astype(cdtype)
    h_eff = jnp.matmul(h_t, g[:, None])
    h_eff = jnp.transpose(h_eff, (0, 1, 5, 2, 6, 3, 4))
    return remove_nulled_scs(h_eff)


class RZFPrecoder(Block):
    """Regularized zero-forcing precoding of OFDM resource grids
    (reference precoding.py:15).

    Input: x [b, tx, streams_per_tx, sym, fft], h [b, rx, rxa, tx,
    txa, sym, fft], alpha (default 0 = ZF).  Output: x_precoded
    [b, tx, txa, sym, fft] (+ h_eff if return_effective_channel).
    """

    def __init__(self, resource_grid, stream_management,
                 return_effective_channel=False, precision=None):
        super().__init__(precision=precision)
        assert isinstance(resource_grid, ResourceGrid)
        assert isinstance(stream_management, StreamManagement)
        self._resource_grid = resource_grid
        self._stream_management = stream_management
        self._return_effective_channel = bool(return_effective_channel)
        self._remove_nulled_scs = RemoveNulledSubcarriers(resource_grid)

    def call(self, x, h, alpha=0.):
        # [b, tx, sym, fft, streams_per_tx]
        x_precoded = jnp.transpose(x, (0, 1, 3, 4, 2)).astype(
            self.cdtype)
        h_pc_desired = _gather_desired_channels(
            h.astype(self.cdtype), self._stream_management)

        alpha = expand_to_rank(jnp.asarray(alpha, self.rdtype), 4,
                               axis=0)
        x_precoded, g = rzf_precoder(x_precoded, h_pc_desired,
                                     alpha=alpha,
                                     return_precoding_matrices=True,
                                     precision=self.precision)
        # [b, tx, txa, sym, fft]
        x_precoded = jnp.transpose(x_precoded, (0, 1, 4, 2, 3))
        if self._return_effective_channel:
            h_eff = _effective_channel(h, g, self._remove_nulled_scs,
                                       self.cdtype)
            return x_precoded, h_eff
        return x_precoded


class PrecodedChannel(Block):
    """Abstract base computing the effective channel after precoding
    (reference precoding.py:179).  Output feeds
    :class:`~sionna_tpu.phy.ofdm.PostEqualizationSINR`."""

    def __init__(self, resource_grid, stream_management,
                 precision=None):
        super().__init__(precision=precision)
        assert isinstance(resource_grid, ResourceGrid)
        assert isinstance(stream_management, StreamManagement)
        self._resource_grid = resource_grid
        self._stream_management = stream_management
        self._remove_nulled_scs = RemoveNulledSubcarriers(resource_grid)

    def get_desired_channels(self, h_hat):
        """[b, rx, rxa, tx, txa, sym, fft] -> [b, tx, sym, fft,
        streams_per_tx, txa] (reference precoding.py:246)."""
        h_pc_desired = _gather_desired_channels(
            jnp.asarray(h_hat, self.cdtype), self._stream_management)
        if h_pc_desired.shape[-2] != \
                self._stream_management.num_streams_per_tx:
            raise ValueError(
                "The required number of streams per transmitter does "
                "not match the channel dimensions")
        return h_pc_desired

    def compute_effective_channel(self, h, g):
        """Effective channel after precoding
        (reference precoding.py:297)."""
        return _effective_channel(jnp.asarray(h, self.cdtype), g,
                                  self._remove_nulled_scs, self.cdtype)

    def apply_tx_power(self, g, tx_power):
        """Scales precoding columns by per-stream sqrt power
        (reference precoding.py:348)."""
        tx_power = expand_to_rank(jnp.asarray(tx_power, self.rdtype),
                                  6, axis=-1)
        # [b, tx, sym, fft, 1(txa), streams]
        tx_power = jnp.transpose(tx_power, (0, 1, 3, 4, 5, 2))
        return jnp.sqrt(tx_power).astype(self.cdtype) * g

    @abstractmethod
    def call(self, h, tx_power, h_hat=None, **kwargs):
        ...


class RZFPrecodedChannel(PrecodedChannel):
    """Effective channel after RZF precoding
    (reference precoding.py:375)."""

    def call(self, h, tx_power, h_hat=None, alpha=0.):
        if h_hat is None:
            h_hat = h
        h_pc_desired = self.get_desired_channels(h_hat)
        alpha = expand_to_rank(jnp.asarray(alpha, self.rdtype), 4,
                               axis=-1)
        g = rzf_precoding_matrix(h_pc_desired, alpha,
                                 precision=self.precision)
        g = self.apply_tx_power(g, tx_power)
        return self.compute_effective_channel(h, g)


class CBFPrecodedChannel(PrecodedChannel):
    """Effective channel after conjugate beamforming
    (reference precoding.py:448)."""

    def call(self, h, tx_power, h_hat=None):
        if h_hat is None:
            h_hat = h
        h_pc_desired = self.get_desired_channels(h_hat)
        g = cbf_precoding_matrix(h_pc_desired,
                                 precision=self.precision)
        g = self.apply_tx_power(g, tx_power)
        return self.compute_effective_channel(h, g)


class EyePrecodedChannel(PrecodedChannel):
    """Effective channel for identity precoding (power allocation
    only; reference precoding.py:513)."""

    def call(self, h, tx_power):
        h = jnp.asarray(h, self.cdtype)
        b, _, _, num_tx, num_tx_ant, num_sym, fft = h.shape
        g = jnp.broadcast_to(
            jnp.eye(num_tx_ant, dtype=self.cdtype),
            (b, num_tx, num_sym, fft, num_tx_ant, num_tx_ant))
        g = self.apply_tx_power(g, tx_power)
        return self.compute_effective_channel(h, g)
