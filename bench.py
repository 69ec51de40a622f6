"""Benchmark driver for Sionna-TPU.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}.

Headline workload (BASELINE.md): coded-AWGN link Monte-Carlo info-bit
throughput - 16-QAM over AWGN with 5G LDPC n=2048 rate 1/2 BP-20
(min-sum), batch 2000. The reference's best published number for this
workload is 10.995 Mb/s (graph mode, RTX A6000;
tutorials/phy/Sionna_tutorial_part1.ipynb cell 63). vs_baseline is the
ratio of our info-bit throughput to that number.

TPU constraint: only integer/real scalars are fetched from device (the
axon backend cannot transfer complex arrays device-to-host).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_BITS_PER_S = 10.995e6


def bench_coded_awgn():
    from sionna_tpu.phy import BinarySource, Mapper, Demapper, AWGN
    from sionna_tpu.phy.fec.ldpc import LDPC5GEncoder, LDPC5GDecoder
    from sionna_tpu.phy.utils import ebnodb2no

    nbps = 4
    k, n = 1024, 2048
    batch_size = 2000

    src = BinarySource()
    enc = LDPC5GEncoder(k, n, num_bits_per_symbol=nbps)
    mapper = Mapper("qam", nbps)
    demapper = Demapper("app", "qam", nbps)
    dec = LDPC5GDecoder(enc, num_iter=20, cn_update="minsum")
    awgn = AWGN()

    @jax.jit
    def step(ebno_db, key):
        k1, k2 = jax.random.split(key)
        no = ebnodb2no(ebno_db, nbps, k / n)
        b = src([batch_size, k], key=k1)
        c = enc(b)
        x = mapper(c)
        y = awgn(x, no, key=k2)
        llr = demapper(y, no)
        b_hat = dec(llr)
        return jnp.sum((b != b_hat).astype(jnp.int32))

    key = jax.random.PRNGKey(0)
    ebno = jnp.asarray(4.0, jnp.float32)
    step(ebno, key).block_until_ready()  # compile

    n_iters = 20
    t0 = time.perf_counter()
    errs = 0
    for i in range(n_iters):
        e = step(ebno, jax.random.fold_in(key, i))
    e.block_until_ready()
    dt = time.perf_counter() - t0
    info_bits = n_iters * batch_size * k
    return info_bits / dt


def main():
    throughput = bench_coded_awgn()
    result = {
        "metric": "coded_awgn_ldpc_mc_info_bit_throughput",
        "value": round(throughput / 1e6, 3),
        "unit": "Mbit/s",
        "vs_baseline": round(throughput / BASELINE_BITS_PER_S, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
