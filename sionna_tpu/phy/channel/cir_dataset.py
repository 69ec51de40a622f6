"""CIR dataset adapter (reference:
src/sionna/phy/channel/cir_dataset.py:12).

Wraps a Python generator of externally produced CIRs (e.g. from the
ray tracer) as a :class:`ChannelModel`. The generator yields
``(a, tau)`` for a single example; batches are assembled on the host
(the reference uses tf.data; here plain Python + numpy stacking, since
CIR production is host-side anyway)."""

import numpy as np

import jax.numpy as jnp

from .channel_model import ChannelModel


class CIRDataset(ChannelModel):
    """Channel model that replays CIRs from a generator."""

    def __init__(self, cir_generator, batch_size, num_rx, num_rx_ant,
                 num_tx, num_tx_ant, num_paths, num_time_steps,
                 precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        self._cir_generator = cir_generator
        self._batch_size = int(batch_size)
        self._num_rx = num_rx
        self._num_rx_ant = num_rx_ant
        self._num_tx = num_tx
        self._num_tx_ant = num_tx_ant
        self._num_paths = num_paths
        self._num_time_steps = num_time_steps
        self._iter = None

    @property
    def batch_size(self):
        return self._batch_size

    @batch_size.setter
    def batch_size(self, value):
        self._batch_size = int(value)

    def _next(self):
        if self._iter is None:
            self._iter = iter(self._cir_generator())
        try:
            return next(self._iter)
        except StopIteration:
            self._iter = iter(self._cir_generator())
            return next(self._iter)

    def __call__(self, batch_size=None, num_time_steps=None,
                 sampling_frequency=None, **kwargs):
        del kwargs
        bs = self._batch_size if batch_size is None else int(batch_size)
        a_list, tau_list = [], []
        for _ in range(bs):
            a, tau = self._next()
            a_list.append(np.asarray(a))
            tau_list.append(np.asarray(tau))
        # complex host->device transfer via split parts (some TPU
        # transfer layers do not implement complex device_put)
        from ..utils.tensors import put_complex
        a = put_complex(np.stack(a_list), self.cdtype)
        tau = jnp.asarray(np.stack(tau_list), self.rdtype)
        return a, tau
