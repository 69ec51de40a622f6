"""Global configuration for Sionna-TPU.

TPU-native re-design of the reference's global config singleton
(reference: src/sionna/phy/config.py:34-201). Differences from the
reference are deliberate and JAX-idiomatic:

* Random state: besides Python/NumPy RNG streams, the config owns a JAX
  PRNG *key stream*. ``config.next_key()`` splits a fresh subkey off the
  root key (host-side, stateful convenience). Pure code paths (anything
  under ``jax.jit``) should instead thread explicit keys; all random
  blocks accept an optional ``key`` argument for that purpose.
* Precision: "single" (float32/complex64) or "double"
  (float64/complex128). Double precision requires x64 mode, which this
  package enables at import time; on TPU double precision is software
  emulated and slow - use it for ill-conditioned linear algebra only.
"""

import random

import numpy as np

import jax
import jax.numpy as jnp

# Sionna-TPU always runs JAX with x64 enabled so that "double" precision
# is available. All internal code passes explicit dtypes, so enabling
# x64 does not change the numerics of "single" precision paths.
jax.config.update("jax_enable_x64", True)

#: Map of precision name to the associated JAX/NumPy dtypes
dtypes = {
    "single": {
        "jax": {
            "rdtype": jnp.float32,
            "cdtype": jnp.complex64,
        },
        "np": {
            "rdtype": np.float32,
            "cdtype": np.complex64,
        },
    },
    "double": {
        "jax": {
            "rdtype": jnp.float64,
            "cdtype": jnp.complex128,
        },
        "np": {
            "rdtype": np.float64,
            "cdtype": np.complex128,
        },
    },
}


class Config:
    """Singleton holding global state: seed, precision, RNG streams.

    The ``seed`` property seeds Python's ``random``, NumPy, and the JAX
    key stream together so that simulations are reproducible end to end
    (mirrors reference config.py:137-151).
    """

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
            cls._instance._initialized = False
        return cls._instance

    def __init__(self):
        if self._initialized:
            return
        self._initialized = True
        self._seed = None
        self._py_rng = None
        self._np_rng = None
        self._root_key = None
        self._key_count = 0
        self._precision = "single"

    # ------------------------------------------------------------------
    # RNG streams
    # ------------------------------------------------------------------
    @property
    def py_rng(self):
        """`random.Random` : Python RNG stream"""
        if self._py_rng is None:
            self._py_rng = random.Random()
            if self._seed is not None:
                self._py_rng.seed(self._seed)
        return self._py_rng

    @property
    def np_rng(self):
        """`np.random.Generator` : NumPy RNG stream"""
        if self._np_rng is None:
            self._np_rng = np.random.default_rng(self._seed)
        return self._np_rng

    @property
    def key(self):
        """jax.Array : Current root PRNG key (read-only view)"""
        if self._root_key is None:
            seed = self._seed
            if seed is None:
                seed = random.SystemRandom().randint(0, 2**31 - 1)
            self._root_key = jax.random.PRNGKey(seed)
        return self._root_key

    def next_key(self, n=None):
        """Return a fresh PRNG subkey (or ``n`` subkeys), advancing the
        global key stream. Host-side stateful convenience; do not call
        from inside ``jax.jit``-traced code."""
        root = self.key
        self._key_count += 1
        key = jax.random.fold_in(root, self._key_count)
        if n is None:
            return key
        return jax.random.split(key, n)

    # ------------------------------------------------------------------
    # Seed
    # ------------------------------------------------------------------
    @property
    def seed(self):
        """int | None : Global seed; setting it reseeds all RNG streams"""
        return self._seed

    @seed.setter
    def seed(self, seed):
        if seed is not None:
            seed = int(seed)
        self._seed = seed
        self._py_rng = random.Random()
        self._py_rng.seed(seed)
        self._np_rng = np.random.default_rng(seed)
        self._root_key = jax.random.PRNGKey(seed if seed is not None else 0)
        self._key_count = 0

    # ------------------------------------------------------------------
    # Precision
    # ------------------------------------------------------------------
    @property
    def precision(self):
        """"single" | "double" : Global numerical precision"""
        return self._precision

    @precision.setter
    def precision(self, v):
        if v not in ("single", "double"):
            raise ValueError("precision must be 'single' or 'double'")
        self._precision = v

    @property
    def np_rdtype(self):
        """np.dtype : NumPy real dtype for the global precision"""
        return dtypes[self.precision]["np"]["rdtype"]

    @property
    def np_cdtype(self):
        """np.dtype : NumPy complex dtype for the global precision"""
        return dtypes[self.precision]["np"]["cdtype"]

    @property
    def rdtype(self):
        """jnp.dtype : JAX real dtype for the global precision"""
        return dtypes[self.precision]["jax"]["rdtype"]

    @property
    def cdtype(self):
        """jnp.dtype : JAX complex dtype for the global precision"""
        return dtypes[self.precision]["jax"]["cdtype"]

    # Aliases matching the reference's tf_* names for easy porting
    @property
    def jax_rdtype(self):
        return self.rdtype

    @property
    def jax_cdtype(self):
        return self.cdtype


#: The global configuration singleton
config = Config()
