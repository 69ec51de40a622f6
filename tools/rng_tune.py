"""PRNG + mapper microbenchmarks at flagship shapes (run ALONE on
TPU).  Informs the round-5 TX/RX fast paths: threefry generates one
32-bit word per BIT for bernoulli and per float for normals — the
flagship profile showed ~4 ms/iter in BinarySource alone.

Variants:
  bern-threefry : jax.random.bernoulli (baseline)
  bern-packed   : random_bits + 32-way unpack (32x fewer words)
  bern-rbg      : bernoulli under the rbg (hardware Philox) impl
  norm-threefry / norm-rbg : AWGN-sized complex normal draws
  map-take / map-gray : 16-QAM mapping, table take vs closed-form
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import bench  # noqa: F401

B, NBITS = 2048, 6144
N_SCAN = 8


def timed(chunk, *args, n_calls=3):
    int(chunk(*args))
    int(chunk(*args))
    t0 = time.perf_counter()
    for _ in range(n_calls):
        int(chunk(*args))
    return (time.perf_counter() - t0) / n_calls / N_SCAN * 1e3


def scan_chunk(body_fn):
    @jax.jit
    def chunk(key):
        def body(carry, i):
            kk = jax.random.fold_in(key, i)
            return carry + body_fn(kk), None
        tot, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(N_SCAN))
        return tot
    return chunk


def unpack_bits(words, nbits):
    """uint32 words [..., W] -> float 0/1 bits [..., W*32]."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    b = (words[..., None] >> shifts) & jnp.uint32(1)
    return b.reshape(words.shape[:-1] + (-1,))[..., :nbits].astype(
        jnp.float32)


def main():
    key_tf = jax.random.PRNGKey(0)
    key_rbg = jax.random.PRNGKey(0, impl="rbg")

    dt = timed(scan_chunk(lambda k: jnp.sum(jax.random.bernoulli(
        k, 0.5, (B, NBITS)).astype(jnp.int32))), key_tf)
    print(f"bern-threefry {dt:7.3f} ms", flush=True)

    def packed(k):
        w = jax.random.bits(k, (B, NBITS // 32), jnp.uint32)
        return jnp.sum(unpack_bits(w, NBITS)).astype(jnp.int32)
    dt = timed(scan_chunk(packed), key_tf)
    print(f"bern-packed   {dt:7.3f} ms", flush=True)

    dt = timed(scan_chunk(lambda k: jnp.sum(jax.random.bernoulli(
        k, 0.5, (B, NBITS)).astype(jnp.int32))), key_rbg)
    print(f"bern-rbg      {dt:7.3f} ms", flush=True)

    def packed_rbg(k):
        w = jax.random.bits(k, (B, NBITS // 32), jnp.uint32)
        return jnp.sum(unpack_bits(w, NBITS)).astype(jnp.int32)
    dt = timed(scan_chunk(packed_rbg), key_rbg)
    print(f"bern-packed-rbg {dt:7.3f} ms", flush=True)

    shape = (B, 14, 256)
    for name, kk in (("norm-threefry", key_tf), ("norm-rbg", key_rbg)):
        def norm(k):
            k1, k2 = jax.random.split(k)
            re = jax.random.normal(k1, shape)
            im = jax.random.normal(k2, shape)
            return jnp.sum(re * re + im * im).astype(jnp.int32)
        dt = timed(scan_chunk(norm), kk)
        print(f"{name:14s}{dt:7.3f} ms", flush=True)

    # ---- mapper variants (16-QAM, flagship symbol count) ----------
    from sionna_tpu.phy import Mapper
    mapper = Mapper("qam", 4)
    pts = jnp.asarray(mapper.constellation.points)
    bits = jax.random.bernoulli(
        key_tf, 0.5, (B, 12288)).astype(jnp.float32)

    def map_take(b):
        return mapper(b)

    def map_gray(b):
        # closed-form Gray 16-QAM: I from bits (0, 2), Q from (1, 3)
        bb = b.reshape(B, -1, 4)
        s0, s1, s2, s3 = (1. - 2. * bb[..., i] for i in range(4))
        norm = 1. / jnp.sqrt(10.)
        re = s0 * (2. - s2) * norm
        im = s1 * (2. - s3) * norm
        return re + 1j * im

    x_t = np.asarray(jax.jit(map_take)(bits))
    x_g = np.asarray(jax.jit(map_gray)(bits)).reshape(x_t.shape)
    print("gray exact:", np.array_equal(x_t, x_g),
          "maxerr:", np.max(np.abs(x_t - x_g)), flush=True)

    for name, fn in (("map-take", map_take), ("map-gray", map_gray)):
        @jax.jit
        def chunk(b, fn=fn):
            def body(carry, i):
                x = fn(b + 0. * i)
                return carry + jnp.sum(
                    jnp.abs(x) ** 2).astype(jnp.int32), None
            tot, _ = jax.lax.scan(body, jnp.int32(0),
                                  jnp.arange(N_SCAN))
            return tot
        dt = timed(chunk, bits)
        print(f"{name:14s}{dt:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
