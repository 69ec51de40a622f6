"""Benchmark driver for Sionna-TPU.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}.

Headline workload (BASELINE.md): coded-AWGN link Monte-Carlo info-bit
throughput - QAM over AWGN with 5G LDPC n=2048 rate 1/2, batch 2000
(reference best published: 10.995 Mb/s graph mode on RTX A6000,
tutorials/phy/Sionna_tutorial_part1.ipynb cell 63). Until the LDPC
decoder lands, this measures the uncoded 16-QAM AWGN chain and reports
vs_baseline=0.0 to signal "not yet comparable".
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def bench_uncoded_awgn():
    from sionna_tpu.phy import BinarySource, Mapper, Demapper, AWGN
    from sionna_tpu.phy.utils import ebnodb2no, hard_decisions

    num_bits_per_symbol = 4
    batch_size = 2000
    n = 2048  # bits per example

    binary_source = BinarySource()
    mapper = Mapper("qam", num_bits_per_symbol)
    demapper = Demapper("app", "qam", num_bits_per_symbol)
    awgn = AWGN()

    @jax.jit
    def step(ebno_db, key):
        k1, k2 = jax.random.split(key)
        no = ebnodb2no(ebno_db, num_bits_per_symbol, 1.0)
        b = binary_source([batch_size, n], key=k1)
        x = mapper(b)
        y = awgn(x, no, key=k2)
        llr = demapper(y, no)
        b_hat = hard_decisions(llr)
        return jnp.sum((b != b_hat).astype(jnp.int32))

    key = jax.random.PRNGKey(0)
    ebno = jnp.asarray(6.0, jnp.float32)
    # Warmup / compile
    step(ebno, key).block_until_ready()

    n_iters = 50
    t0 = time.perf_counter()
    for i in range(n_iters):
        errs = step(ebno, jax.random.fold_in(key, i))
    errs.block_until_ready()
    dt = time.perf_counter() - t0
    bits = n_iters * batch_size * n
    return bits / dt


def main():
    throughput = bench_uncoded_awgn()
    result = {
        "metric": "uncoded_16qam_awgn_mc_bit_throughput",
        "value": round(throughput / 1e6, 3),
        "unit": "Mbit/s",
        "vs_baseline": 0.0,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
