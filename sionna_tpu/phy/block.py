"""Object/Block base classes for Sionna-TPU.

TPU-native re-design of the reference block abstraction
(reference: src/sionna/phy/block.py:13-155). Key differences:

* No lazy ``build()``: under JAX, shape-dependent precompute happens
  naturally at trace time inside ``call``; shape-independent precompute
  happens in ``__init__`` (NumPy, host-side).
* ``__call__`` casts floating/complex *array* inputs to the block's
  precision via ``jax.tree_util.tree_map`` and dispatches to ``call``.
  ``call`` must be a pure function of its inputs so blocks compose
  freely under ``jit``/``vmap``/``grad``/``shard_map``.
* Blocks are *static* containers: their attributes (shapes, code
  structure, precomputed index maps) are compile-time constants. Any
  trainable array is exposed via call-time arguments so that standard
  JAX functional optimization applies.
"""

from abc import ABC

import numpy as np

import jax
import jax.numpy as jnp

from .config import config, dtypes


class Object(ABC):
    """Base class for all Sionna-TPU objects.

    Resolves the per-instance precision against the global config and
    exposes the associated real/complex dtypes.
    """

    def __init__(self, *args, precision=None, **kwargs):
        if precision is None:
            self._precision = config.precision
        elif precision in ("single", "double"):
            self._precision = precision
        else:
            raise ValueError(f"Unknown precision: {precision}")

    @property
    def precision(self):
        """"single" | "double" : Precision of this object"""
        return self._precision

    @property
    def cdtype(self):
        """jnp.dtype : Complex dtype of this object"""
        return dtypes[self.precision]["jax"]["cdtype"]

    @property
    def rdtype(self):
        """jnp.dtype : Real dtype of this object"""
        return dtypes[self.precision]["jax"]["rdtype"]

    @property
    def np_cdtype(self):
        """np.dtype : NumPy complex dtype of this object"""
        return dtypes[self.precision]["np"]["cdtype"]

    @property
    def np_rdtype(self):
        """np.dtype : NumPy real dtype of this object"""
        return dtypes[self.precision]["np"]["rdtype"]

    def _cast_or_check_precision(self, v):
        """Cast an array to this object's precision (real or complex)."""
        v = jnp.asarray(v)
        if jnp.issubdtype(v.dtype, jnp.complexfloating):
            return v.astype(self.cdtype)
        if jnp.issubdtype(v.dtype, jnp.floating):
            return v.astype(self.rdtype)
        return v


def _is_leaf_array(v):
    return isinstance(v, (jax.Array, np.ndarray))


class Block(Object):
    """Base class for all processing blocks.

    A block's ``__call__`` (1) converts floating/complex array arguments
    to the block's precision and (2) dispatches to the subclass's pure
    ``call`` method. Integer/bool arrays and non-array leaves pass
    through unchanged. Mirrors the casting contract of the reference
    (block.py:122-131,144-155) without lazy building.
    """

    def __init__(self, *args, precision=None, **kwargs):
        super().__init__(*args, precision=precision, **kwargs)

    def _cast_input(self, v):
        if v is None:
            return None
        if isinstance(v, (bool, int, str, bytes)) or callable(v):
            return v
        if isinstance(v, (jax.Array, np.ndarray)):
            dt = np.asarray(v).dtype if isinstance(v, np.ndarray) else v.dtype
            if jnp.issubdtype(dt, jnp.complexfloating):
                return jnp.asarray(v, self.cdtype)
            if jnp.issubdtype(dt, jnp.floating):
                return jnp.asarray(v, self.rdtype)
            return jnp.asarray(v)
        if isinstance(v, float):
            return jnp.asarray(v, self.rdtype)
        if isinstance(v, complex):
            return jnp.asarray(v, self.cdtype)
        return v

    def call(self, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, *args, **kwargs):
        args = [
            jax.tree_util.tree_map(self._cast_input, a)
            if not isinstance(a, (bool, int, str)) else a
            for a in args
        ]
        kwargs = {
            k: (jax.tree_util.tree_map(self._cast_input, v)
                if not isinstance(v, (bool, int, str)) else v)
            for k, v in kwargs.items()
        }
        return self.call(*args, **kwargs)
