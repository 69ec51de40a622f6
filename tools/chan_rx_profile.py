"""Channel + RX sub-stage profile (flagship shapes).  DCE-proof:
every stage's chunk reduces ALL live intermediates into the fetched
scalar, so adding a stage strictly adds its work.  Run ALONE."""
import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import bench  # noqa: F401

BATCH, N_SCAN = 2048, 16


def timed(chunk, *args, n_calls=3):
    int(chunk(*args))
    int(chunk(*args))
    ts = []
    for _ in range(n_calls):
        t0 = time.perf_counter()
        int(chunk(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / N_SCAN * 1e3


def main():
    from sionna_tpu.phy import BinarySource, Mapper, Demapper
    from sionna_tpu.phy.mimo import StreamManagement
    from sionna_tpu.phy.ofdm import (ResourceGrid, ResourceGridMapper,
                                     LSChannelEstimator, LMMSEEqualizer)
    from sionna_tpu.phy.channel import (GenerateOFDMChannel,
                                        ApplyOFDMChannel,
                                        subcarrier_frequencies,
                                        cir_to_ofdm_channel, AWGN)
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
    freqs = subcarrier_frequencies(rg.fft_size, rg.subcarrier_spacing)
    awgn = AWGN()
    est = LSChannelEstimator(rg, interpolation_type="nn")
    equ = LMMSEEqualizer(rg, sm)
    demapper = Demapper("app", "qam", nbps)
    no = float(np.asarray(ebnodb2no(5.0, nbps, r, rg)))

    def r2(x):
        if jnp.iscomplexobj(x):
            return jnp.sum(jnp.real(x) + jnp.imag(x))
        return jnp.sum(x)

    def stage_chunk(stop):
        @jax.jit
        def chunk(key):
            def body(carry, i):
                kk = jax.random.fold_in(key, i)
                k1, k2, k3 = jax.random.split(kk, 3)
                acc = jnp.float32(0.)
                b = src([BATCH, 1, 1, k], key=k1)
                x_rg = rg_mapper(mapper(il(enc(b))))
                acc += r2(x_rg)
                if stop >= 1:      # TDL CIR draw
                    a, tau = tdl(BATCH, rg.num_ofdm_symbols,
                                 1. / rg.ofdm_symbol_duration, key=k2)
                    acc += r2(a) + r2(tau)
                if stop >= 2:      # CIR -> frequency channel
                    h_freq = cir_to_ofdm_channel(freqs, a, tau,
                                                 normalize=True)
                    acc += r2(h_freq)
                if stop >= 3:      # apply + noise
                    y = jnp.einsum("bmnpqst,bpqst->bmnst",
                                   h_freq, x_rg)
                    y = awgn(y, no, key=k3)
                    acc += r2(y)
                if stop >= 4:
                    h_hat, err_var = est(y, no)
                    acc += r2(h_hat) + r2(err_var)
                if stop >= 5:
                    x_hat, no_eff = equ(y, h_hat, err_var, no)
                    acc += r2(x_hat) + r2(no_eff)
                if stop >= 6:
                    llr = demapper(x_hat, no_eff)
                    acc += r2(llr)
                if stop >= 7:
                    acc += r2(dil(llr))
                return carry + acc.astype(jnp.int32), None
            tot, _ = jax.lax.scan(body, jnp.int32(0),
                                  jnp.arange(N_SCAN))
            return tot
        return chunk

    names = ["tx", "+tdl_cir", "+cir2ofdm", "+apply_awgn", "+est",
             "+equ", "+demap", "+deint"]
    key = jax.random.PRNGKey(0)
    prev = 0.
    for stop, name in enumerate(names):
        dt = timed(stage_chunk(stop), key)
        print(f"{name:12s} {dt:7.2f} ms/iter  (delta {dt-prev:+6.2f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
