"""RX-chain + channel stage microbenchmark at flagship shapes, with
N_SCAN deep enough that the ~30 ms tunnel RPC cost per call is noise.
Also A/Bs mapper and encoder fast-path variants.  Run ALONE."""
import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import bench  # noqa: F401

BATCH, N_SCAN = 2048, 32


def timed(chunk, *args, n_calls=2):
    int(chunk(*args))
    int(chunk(*args))
    t0 = time.perf_counter()
    for _ in range(n_calls):
        int(chunk(*args))
    return (time.perf_counter() - t0) / n_calls / N_SCAN * 1e3


def main():
    from sionna_tpu.phy import BinarySource, Mapper, Demapper
    from sionna_tpu.phy.mimo import StreamManagement
    from sionna_tpu.phy.ofdm import (ResourceGrid, ResourceGridMapper,
                                     LSChannelEstimator, LMMSEEqualizer)
    from sionna_tpu.phy.channel import OFDMChannel
    from sionna_tpu.phy.channel.tr38901 import TDL
    from sionna_tpu.phy.fec.ldpc import LDPC5GEncoder
    from sionna_tpu.phy.fec.interleaving import (RowColumnInterleaver,
                                                 Deinterleaver)
    from sionna_tpu.phy.utils import ebnodb2no

    nbps, r = 4, 0.5
    rg = ResourceGrid(num_ofdm_symbols=14, fft_size=256,
                      subcarrier_spacing=30e3, num_tx=1,
                      num_streams_per_tx=1, cyclic_prefix_length=16,
                      pilot_pattern="kronecker",
                      pilot_ofdm_symbol_indices=[2, 11])
    sm = StreamManagement(np.array([[1]]), 1)
    n = int(rg.num_data_symbols) * nbps
    k = int(n * r)
    src = BinarySource()
    enc = LDPC5GEncoder(k, n)
    il = RowColumnInterleaver(row_depth=nbps)
    dil = Deinterleaver(il)
    mapper = Mapper("qam", nbps)
    rg_mapper = ResourceGridMapper(rg)
    tdl = TDL("A", 100e-9, 3.5e9, min_speed=3, max_speed=3)
    channel = OFDMChannel(tdl, rg, normalize_channel=True)
    est = LSChannelEstimator(rg, interpolation_type="nn")
    equ = LMMSEEqualizer(rg, sm)
    demapper = Demapper("app", "qam", nbps)
    no = float(np.asarray(ebnodb2no(5.0, nbps, r, rg)))

    def stage_chunk(stop):
        @jax.jit
        def chunk(key):
            def body(carry, i):
                kk = jax.random.fold_in(key, i)
                k1, k2 = jax.random.split(kk)
                b = src([BATCH, 1, 1, k], key=k1)
                x_rg = rg_mapper(mapper(il(enc(b))))
                y = channel(x_rg, no, key=k2)
                out = y
                if stop >= 1:
                    h_hat, err_var = est(y, no)
                    out = h_hat
                if stop >= 2:
                    x_hat, no_eff = equ(y, h_hat, err_var, no)
                    out = x_hat
                if stop >= 3:
                    llr = demapper(x_hat, no_eff)
                    out = llr
                if stop >= 4:
                    out = dil(llr)
                if jnp.iscomplexobj(out):
                    e = jnp.sum(jnp.abs(out) ** 2).astype(jnp.int32)
                else:
                    e = jnp.sum(jnp.abs(out)).astype(jnp.int32)
                return carry + e, None
            tot, _ = jax.lax.scan(body, jnp.int32(0),
                                  jnp.arange(N_SCAN))
            return tot
        return chunk

    names = ["tx+channel", "+est", "+equ", "+demap", "+deint"]
    key = jax.random.PRNGKey(0)
    prev = 0.
    for stop, name in enumerate(names):
        dt = timed(stage_chunk(stop), key)
        print(f"{name:12s} {dt:7.2f} ms/iter  (delta {dt-prev:+6.2f})",
              flush=True)
        prev = dt

    # ---- mapper variants -----------------------------------------
    bits = jax.random.bernoulli(key, 0.5,
                                (BATCH, 12288)).astype(jnp.float32)

    def map_take(b):
        return mapper(b)

    def map_gray(b):
        bb = b.reshape(BATCH, -1, 4)
        s0, s1, s2, s3 = (1. - 2. * bb[..., i] for i in range(4))
        nrm = 1. / jnp.sqrt(10.)
        return (s0 * (2. - s2) + 1j * s1 * (2. - s3)) * nrm

    x_t = np.asarray(jax.jit(map_take)(bits)).reshape(BATCH, -1)
    x_g = np.asarray(jax.jit(map_gray)(bits))
    print("gray maxerr:", float(np.max(np.abs(x_t - x_g))), flush=True)

    for name, fn in (("map-take", map_take), ("map-gray", map_gray)):
        @jax.jit
        def chunk(b, fn=fn):
            def body(carry, i):
                x = fn(b + 0. * jnp.float32(i))
                return carry + jnp.sum(
                    jnp.abs(x) ** 2).astype(jnp.int32), None
            tot, _ = jax.lax.scan(body, jnp.int32(0),
                                  jnp.arange(N_SCAN))
            return tot
        print(f"{name:12s} {timed(chunk, bits):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
