"""Error-rate metrics (API parity with reference
src/sionna/phy/utils/metrics.py:9-116; fresh JAX implementations)."""

import jax.numpy as jnp

from ..config import dtypes


def count_errors(b, b_hat):
    """Number of positions where ``b != b_hat`` (int64 scalar)."""
    return jnp.sum((jnp.asarray(b) != jnp.asarray(b_hat)).astype(jnp.int64))


def count_block_errors(b, b_hat):
    """Number of rows (last axis = block) with at least one error."""
    errs = jnp.any(jnp.asarray(b) != jnp.asarray(b_hat), axis=-1)
    return jnp.sum(errs.astype(jnp.int64))


def compute_ber(b, b_hat, precision="double"):
    """Bit error rate between ``b`` and ``b_hat``."""
    rdtype = dtypes[precision]["jax"]["rdtype"]
    b = jnp.asarray(b)
    ber = jnp.mean((b != jnp.asarray(b_hat)).astype(rdtype))
    return ber


def compute_ser(s, s_hat, precision="double"):
    """Symbol error rate between ``s`` and ``s_hat``."""
    rdtype = dtypes[precision]["jax"]["rdtype"]
    s = jnp.asarray(s)
    ser = jnp.mean((s != jnp.asarray(s_hat)).astype(rdtype))
    return ser


def compute_bler(b, b_hat, precision="double"):
    """Block error rate; the last axis of ``b`` is the block dim."""
    rdtype = dtypes[precision]["jax"]["rdtype"]
    errs = jnp.any(jnp.asarray(b) != jnp.asarray(b_hat), axis=-1)
    return jnp.mean(errs.astype(rdtype))
