"""Structure-of-arrays 3-vector and 2x2-Jones algebra for the RT hot
path.

Why this exists: on TPU the minor-most two logical dimensions of
every array are physically tiled to (8 sublanes, 128 lanes).  The
natural AoS shapes of ray tracing — ``[rays, 3]`` vectors and
``[paths, 2, 2]`` Jones matrices — therefore waste 42x / 340x of
every vector register and HBM word on tile padding, and measured
throughput of the dense Moller-Trumbore kernel drops ~6.5x (5.5 vs
36 Gtests/s on v5e).  Component form keeps the big batch dimension
minor-most, so each component array tiles perfectly.

A "vec3" here is a tuple ``(x, y, z)`` of same-shaped arrays; a
"jones" is a tuple ``(j00, j01, j10, j11)`` of complex arrays.
Functions broadcast like the underlying arrays do.
"""

import jax.numpy as jnp

__all__ = [
    "split3", "pack3", "vdot", "vcross", "vadd", "vsub", "vscale",
    "vnorm", "vnormalize", "vwhere", "jmul", "jmatvec",
]


def split3(v, axis=-1):
    """[..., 3] array -> (x, y, z) component tuple."""
    if axis == -1:
        return v[..., 0], v[..., 1], v[..., 2]
    idx = [slice(None)] * v.ndim
    out = []
    for i in range(3):
        idx[axis] = i
        out.append(v[tuple(idx)])
    return tuple(out)


def pack3(v, axis=-1):
    """(x, y, z) tuple -> [..., 3] array (for boundary crossings
    back into AoS-consuming code)."""
    return jnp.stack(v, axis=axis)


def vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def vcross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def vadd(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def vsub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def vscale(s, a):
    """Scalar (array) times vec3."""
    return (s * a[0], s * a[1], s * a[2])


def vnorm(a):
    return jnp.sqrt(vdot(a, a))


def vnormalize(a, eps=1e-30):
    inv = 1. / jnp.maximum(vnorm(a), eps)
    return vscale(inv, a)


def vwhere(c, a, b):
    """Component-wise jnp.where with a scalar-shaped condition."""
    return (jnp.where(c, a[0], b[0]),
            jnp.where(c, a[1], b[1]),
            jnp.where(c, a[2], b[2]))


def jmul(a, b):
    """2x2 Jones product a @ b in component form
    (a, b: (j00, j01, j10, j11))."""
    a00, a01, a10, a11 = a
    b00, b01, b10, b11 = b
    return (a00 * b00 + a01 * b10,
            a00 * b01 + a01 * b11,
            a10 * b00 + a11 * b10,
            a10 * b01 + a11 * b11)


def jmatvec(j, v0, v1):
    """Jones times a 2-vector -> (w0, w1)."""
    j00, j01, j10, j11 = j
    return j00 * v0 + j01 * v1, j10 * v0 + j11 * v1
