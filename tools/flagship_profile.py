"""Stage-level profile of the flagship link (bench.bench_flagship
workload) on the attached TPU.

Measures scan-fused, host-synced wall time of (a) the full chunk,
(b) the chunk with the LDPC decoder replaced by a hard decision,
(c) decoder-only, (d) TX+channel only — so flagship optimization
effort lands on the real cost centers.  Run ALONE on a quiet box.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import bench

BATCH, N_SCAN = 2048, 8


def build(mode):
    from sionna_tpu.phy import BinarySource, Mapper, Demapper
    from sionna_tpu.phy.mimo import StreamManagement
    from sionna_tpu.phy.ofdm import (ResourceGrid, ResourceGridMapper,
                                     LSChannelEstimator, LMMSEEqualizer)
    from sionna_tpu.phy.channel import OFDMChannel
    from sionna_tpu.phy.channel.tr38901 import TDL
    from sionna_tpu.phy.fec.ldpc import LDPC5GEncoder, LDPC5GDecoder
    from sionna_tpu.phy.fec.interleaving import (RowColumnInterleaver,
                                                 Deinterleaver)
    from sionna_tpu.phy.utils import ebnodb2no

    nbps, r, fft_size = 4, 0.5, 256
    rg = ResourceGrid(num_ofdm_symbols=14, fft_size=fft_size,
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
    dec = LDPC5GDecoder(enc, hard_out=True, cn_update="boxplus",
                        num_iter=20, engine="pallas")

    def step(ebno_db, key):
        no = ebnodb2no(ebno_db, nbps, r, rg)

        def body(carry, i):
            kk = jax.random.fold_in(key, i)
            k1, k2 = jax.random.split(kk)
            b = src([BATCH, 1, 1, k], key=k1)
            if mode == "tx_only":
                x_rg = rg_mapper(mapper(il(enc(b))))
                e = jnp.sum(jnp.abs(x_rg) ** 2).astype(jnp.int32)
                return carry + e, None
            if mode == "tx_channel":
                x_rg = rg_mapper(mapper(il(enc(b))))
                y = channel(x_rg, no, key=k2)
                e = jnp.sum(jnp.abs(y) ** 2).astype(jnp.int32)
                return carry + e, None
            x_rg = rg_mapper(mapper(il(enc(b))))
            y = channel(x_rg, no, key=k2)
            h_hat, err_var = est(y, no)
            x_hat, no_eff = equ(y, h_hat, err_var, no)
            llr = dil(demapper(x_hat, no_eff))
            if mode == "no_decode":
                b_hat = (llr[..., :k] > 0).astype(jnp.float32)
            else:
                b_hat = dec(llr)
            e = jnp.sum((b != b_hat).astype(jnp.int32))
            return carry + e.astype(carry.dtype), None

        tot, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(N_SCAN))
        return tot

    return jax.jit(step), k


def timed(chunk, n_calls=3):
    ebno = jnp.asarray(5.0, jnp.float32)
    key = jax.random.PRNGKey(0)
    int(chunk(ebno, jax.random.fold_in(key, 0)))
    int(chunk(ebno, jax.random.fold_in(key, 999)))
    t0 = time.perf_counter()
    for r in range(n_calls):
        int(chunk(ebno, jax.random.fold_in(key, 1000 + r)))
    return (time.perf_counter() - t0) / n_calls


def main():
    rows = []
    for mode in ("full", "no_decode", "tx_channel", "tx_only"):
        chunk, k = build(mode)
        dt = timed(chunk)
        per_iter = dt / N_SCAN * 1e3
        rows.append((mode, per_iter))
        tput = N_SCAN * BATCH * k / dt / 1e6
        print(f"{mode:12s} {per_iter:7.2f} ms/MC-iter   "
              f"({tput:6.1f} Mb/s info)", flush=True)
    full = dict(rows)["full"]
    nodec = dict(rows)["no_decode"]
    print(f"\ndecoder share: {(full - nodec) / full * 100:.1f}%  "
          f"({full - nodec:.2f} ms)")


if __name__ == "__main__":
    main()
