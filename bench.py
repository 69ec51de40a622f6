"""Benchmark driver for Sionna-TPU.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}.

Headline workload (BASELINE.md): coded-AWGN link Monte-Carlo info-bit
throughput - 16-QAM over AWGN with 5G LDPC n=2048 rate 1/2 BP-20
(min-sum), batch 2000. The reference's best published number for this
workload is 10.995 Mb/s (graph mode, RTX A6000;
tutorials/phy/Sionna_tutorial_part1.ipynb cell 63). vs_baseline is the
ratio of our info-bit throughput to that number.

Measurement: Monte-Carlo iterations are fused on-device with
``lax.scan`` and every timed call fetches its scalar error count to
the host, so the timing reflects sustained synchronous throughput
(async dispatch pipelining is excluded).

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
    n_scan = 10          # MC iterations fused per device call
    n_calls = 4          # timed host-synced calls

    src = BinarySource()
    enc = LDPC5GEncoder(k, n, num_bits_per_symbol=nbps)
    mapper = Mapper("qam", nbps)
    demapper = Demapper("app", "qam", nbps)
    dec = LDPC5GDecoder(enc, num_iter=20, cn_update="minsum")
    awgn = AWGN()

    @jax.jit
    def chunk(ebno_db, key):
        no = ebnodb2no(ebno_db, nbps, k / n)

        def body(carry, i):
            kk = jax.random.fold_in(key, i)
            k1, k2 = jax.random.split(kk)
            b = src([batch_size, k], key=k1)
            c = enc(b)
            y = awgn(mapper(c), no, key=k2)
            b_hat = dec(demapper(y, no))
            return carry + jnp.sum((b != b_hat).astype(jnp.int64)), None

        tot, _ = jax.lax.scan(body, jnp.int64(0), jnp.arange(n_scan))
        return tot.astype(jnp.int32)

    key = jax.random.PRNGKey(0)
    ebno = jnp.asarray(4.0, jnp.float32)
    int(chunk(ebno, key))  # compile + sync
    # A second untimed call absorbs the post-compile execution-path
    # warmup (observed ~1 s on the first run after compilation)
    int(chunk(ebno, jax.random.fold_in(key, 999)))

    t0 = time.perf_counter()
    errs = 0
    for r in range(n_calls):
        errs += int(chunk(ebno, jax.random.fold_in(key, 1000 + r)))
    dt = time.perf_counter() - t0
    info_bits = n_calls * n_scan * batch_size * k
    assert errs > 0  # sanity: the link is actually simulating
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
