"""Shape-algebra utilities (API parity with reference
src/sionna/phy/utils/tensors.py; fresh JAX implementations).

All functions are pure and jit/vmap-safe; shape arguments must be
static (Python ints) as required by XLA.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config


@jax.jit
def _combine_complex(re, im):
    return re + 1j * im


def put_complex(x, dtype=jnp.complex64):
    """Transfers a host complex array to the default device.

    Some TPU transfer layers do not implement complex device_put;
    real and imaginary parts are transferred separately and combined
    in one tiny compiled program (complex values are fine ON device,
    only the host<->device boundary is restricted)."""
    x = np.asarray(x)
    rdt = jnp.float64 if dtype == jnp.complex128 else jnp.float32
    re = jnp.asarray(np.ascontiguousarray(x.real), rdt)
    im = jnp.asarray(np.ascontiguousarray(x.imag), rdt)
    return _combine_complex(re, im).astype(dtype)


def expand_to_rank(tensor, target_rank, axis=-1):
    """Inserts as many size-one axes as needed at ``axis`` so that the
    result has rank ``target_rank`` (reference tensors.py:9)."""
    tensor = jnp.asarray(tensor)
    num_dims = max(target_rank - tensor.ndim, 0)
    return insert_dims(tensor, num_dims, axis)


def insert_dims(tensor, num_dims, axis=-1):
    """Inserts ``num_dims`` size-one axes at position ``axis``
    (reference tensors.py:134)."""
    tensor = jnp.asarray(tensor)
    if num_dims < 0:
        raise ValueError("`num_dims` must be nonnegative.")
    rank = tensor.ndim
    if not -(rank + 1) <= axis <= rank:
        raise ValueError("`axis` is out of range `[-(D+1), D]`)")
    if axis < 0:
        axis += rank + 1
    shape = tensor.shape
    new_shape = shape[:axis] + (1,) * num_dims + shape[axis:]
    return jnp.reshape(tensor, new_shape)


def flatten_dims(tensor, num_dims, axis):
    """Flattens ``num_dims`` consecutive axes starting at ``axis`` into
    one axis (reference tensors.py:44)."""
    tensor = jnp.asarray(tensor)
    if num_dims < 2:
        raise ValueError("`num_dims` must be >= 2")
    if num_dims > tensor.ndim:
        raise ValueError("`num_dims` must <= rank(`tensor`)")
    if axis < 0:
        axis += tensor.ndim
    if not 0 <= axis <= tensor.ndim - 1:
        raise ValueError("0<= `axis` <= rank(tensor)-1")
    if num_dims + axis > tensor.ndim:
        raise ValueError("`num_dims`+`axis` <= rank(`tensor`)")
    shape = tensor.shape
    flat = 1
    for d in shape[axis:axis + num_dims]:
        flat *= d
    new_shape = shape[:axis] + (flat,) + shape[axis + num_dims:]
    return jnp.reshape(tensor, new_shape)


def flatten_last_dims(tensor, num_dims=2):
    """Flattens the last ``num_dims`` axes (reference tensors.py:96)."""
    tensor = jnp.asarray(tensor)
    if num_dims < 2:
        raise ValueError("`num_dims` must be >= 2")
    if num_dims > tensor.ndim:
        raise ValueError("`num_dims` must <= rank(`tensor`)")
    return flatten_dims(tensor, num_dims, tensor.ndim - num_dims)


def split_dim(tensor, shape, axis):
    """Reshapes the axis at position ``axis`` into ``shape``
    (reference tensors.py:179)."""
    tensor = jnp.asarray(tensor)
    if axis < 0:
        axis += tensor.ndim
    if not 0 <= axis <= tensor.ndim - 1:
        raise ValueError("0<= `axis` <= rank(tensor)-1")
    s = tensor.shape
    new_shape = s[:axis] + tuple(shape) + s[axis + 1:]
    return jnp.reshape(tensor, new_shape)


def diag_part_axis(tensor, axis=0):
    """Extracts the diagonal over axes ``axis`` and ``axis+1``
    (reference tensors.py:213)."""
    tensor = jnp.asarray(tensor)
    if axis < 0:
        axis += tensor.ndim
    return jnp.diagonal(tensor, axis1=axis, axis2=axis + 1)


def matrix_diag_part(tensor):
    """Diagonal of the last two axes (like tf.linalg.diag_part)."""
    return jnp.diagonal(tensor, axis1=-2, axis2=-1)


def flatten_multi_index(indices, shape):
    """Converts multi-dimensional indices (last axis holds the
    coordinates) into flat indices for a tensor of shape ``shape``
    (reference tensors.py:319)."""
    indices = jnp.asarray(indices)
    shape = tuple(int(s) for s in shape)
    strides = []
    acc = 1
    for s in reversed(shape):
        strides.append(acc)
        acc *= s
    strides = jnp.asarray(list(reversed(strides)), dtype=indices.dtype)
    return jnp.sum(indices * strides, axis=-1)


def gather_from_batched_indices(params, indices):
    """Gathers values of ``params`` at the batched ``indices``.

    ``params`` has shape ``s`` (rank N); ``indices`` has shape
    ``[..., N]`` where the last axis holds one index per axis of
    ``params``. Returns a tensor of shape ``[...]``
    (reference tensors.py:370).
    """
    params = jnp.asarray(params)
    indices = jnp.asarray(indices)
    flat_idx = flatten_multi_index(indices, params.shape)
    return jnp.take(jnp.reshape(params, (-1,)), flat_idx, axis=0)


def tensor_values_are_in_set(tensor, admissible_set):
    """`True` iff every element of ``tensor`` belongs to
    ``admissible_set`` (reference tensors.py:422)."""
    tensor = jnp.asarray(tensor)
    admissible = jnp.asarray(admissible_set).reshape(-1)
    eq = tensor[..., None] == admissible
    return jnp.all(jnp.any(eq, axis=-1))


def random_tensor_from_values(values, shape, dtype=None, key=None):
    """Random tensor whose entries are drawn uniformly from ``values``
    (reference tensors.py:475)."""
    values = jnp.asarray(values, dtype=dtype).reshape(-1)
    if key is None:
        key = config.next_key()
    idx = jax.random.randint(key, shape, 0, values.shape[0])
    return values[idx]


def enumerate_indices(bounds):
    """Enumerates all index combinations within ``bounds`` as rows of a
    [prod(bounds), len(bounds)] tensor (reference tensors.py:521)."""
    bounds = [int(b) for b in bounds]
    grids = jnp.meshgrid(*[jnp.arange(b) for b in bounds], indexing="ij")
    return jnp.stack([g.reshape(-1) for g in grids], axis=-1)


def find_true_position(bool_tensor, side="last", axis=-1):
    """Position of the first/last `True` along ``axis``; -1 if none
    (reference tensors.py:563)."""
    bool_tensor = jnp.asarray(bool_tensor, bool)
    n = bool_tensor.shape[axis]
    idx = jnp.arange(n)
    bt = jnp.moveaxis(bool_tensor, axis, -1)
    if side == "last":
        pos = jnp.max(jnp.where(bt, idx, -1), axis=-1)
    elif side == "first":
        pos = jnp.min(jnp.where(bt, idx, n), axis=-1)
        pos = jnp.where(pos == n, -1, pos)
    else:
        raise ValueError("side must be 'first' or 'last'")
    return pos
