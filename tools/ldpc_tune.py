"""LDPC Pallas-kernel tuning sweep (flagship decode config).

Measures decoder-only throughput (codeword-iterations/s) for the
flagship workload (BG1, k=6144, n=12288, BP-20 boxplus) across kernel
knobs: batch tile, message dtype (f32 vs bf16).  Run ALONE on the
attached TPU (docs/PERFORMANCE.md benchmark protocol):

    python tools/ldpc_tune.py [--quick]

Methodology per the repo benchmark rules: ``n_scan`` decodes are
fused per jitted call and every timed call is host-synced by fetching
a scalar (async dispatch through the axon tunnel makes a trailing
``block_until_ready`` report impossible numbers — measured 0.0 ms for
a 60 ms decode).  Each variant returns a weighted hard-decision
checksum; equal checksums across variants certify identical hard
outputs on the probe LLRs (bf16 variants report their own checksum
for comparison).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import bench  # noqa: F401  (persistent compile cache)
from sionna_tpu.phy.fec.ldpc import LDPC5GEncoder, LDPC5GDecoder
from sionna_tpu.phy.fec.ldpc.decoding import _lifted_pallas_decode

N_SCAN = 4
NUM_ITER = 20
BATCH = 2048


def make_chunk(decode_fn, nv):
    """Jit-able scan over N_SCAN decodes returning
    [sum-of-checksums, sum-of-hard-ones] (scalar fetch = host sync)."""
    w = (jnp.arange(nv, dtype=jnp.float32) % 97.0) + 1.0

    @jax.jit
    def chunk(llr, eps):
        def body(carry, i):
            marg = decode_fn(llr + eps * (1.0 + i.astype(jnp.float32)))
            hard = (marg.astype(jnp.float32) < 0).astype(jnp.float32)
            sig = jnp.sum(hard * w[None, :])
            return (carry[0] + sig, carry[1] + jnp.sum(hard)), None
        (sig, ones), _ = jax.lax.scan(
            body, (jnp.float32(0.), jnp.float32(0.)),
            jnp.arange(N_SCAN))
        return jnp.stack([sig, ones])

    return chunk


def timed(chunk, llr, n_calls=3):
    out = np.asarray(chunk(llr, jnp.float32(1e-6)))   # compile+sync
    out = np.asarray(chunk(llr, jnp.float32(2e-6)))   # warmup
    t0 = time.perf_counter()
    for r in range(n_calls):
        out = np.asarray(chunk(llr, jnp.float32(2e-6)))
    dt = (time.perf_counter() - t0) / n_calls
    return dt, float(out[0]), float(out[1])


def main():
    quick = "--quick" in sys.argv
    k, n = 6144, 12288
    enc = LDPC5GEncoder(k, n)
    dec = LDPC5GDecoder(enc, hard_out=True, cn_update="boxplus",
                        num_iter=NUM_ITER, engine="pallas")
    lifted = dec._lifted
    nv = lifted._num_vns
    print(f"z={lifted._z} edges={len(lifted._edges)} "
          f"col_blocks={lifted._n_col_blocks} num_vns={nv} "
          f"batch={BATCH} iters={NUM_ITER} n_scan={N_SCAN}",
          flush=True)

    key = jax.random.PRNGKey(0)
    llr_int = jax.random.normal(key, (BATCH, nv), jnp.float32) * 3.0

    def pallas(bt=None, sd=None, af="log1p"):
        return lambda x: _lifted_pallas_decode(
            lifted, x, NUM_ITER, batch_tile=bt, storage_dtype=sd,
            atanh_form=af)

    variants = [
        ("pallas f32 tile=8", None, pallas(8)),
        ("pallas f32 t8 ratio", None, pallas(8, af="ratio")),
        ("pallas f32 tile=12", None, pallas(12)),
        ("pallas bf16s tile=8", None, pallas(8, sd=jnp.bfloat16)),
        ("pallas bf16s tile=16", None, pallas(16, sd=jnp.bfloat16)),
        ("pallas bf16s tile=24", None, pallas(24, sd=jnp.bfloat16)),
    ]
    if not quick:
        variants.append(("lifted-XLA f32", None,
                         lambda x: lifted.decode(x, NUM_ITER)))

    results = []
    for label, dtype, fn in variants:
        try:
            chunk = make_chunk(fn, nv)
            dt, sig, ones = timed(chunk, llr_int)
        except Exception as ex:
            print(f"{label:26s} FAILED: {type(ex).__name__}: "
                  f"{str(ex)[:160]}", flush=True)
            continue
        kiter = N_SCAN * BATCH * NUM_ITER / dt / 1e3
        print(f"{label:26s} {dt*1e3:8.1f} ms  {kiter:7.1f} kiter/s"
              f"  sig={sig:.0f} ones={ones:.0f}", flush=True)
        results.append((label, kiter, sig))

    if results:
        ref_sig = results[0][2]
        best = max(results, key=lambda r: r[1])
        print(f"\nbest: {best[0]}  {best[1]:.1f} kiter/s  "
              f"(sig {'==' if best[2] == ref_sig else '!='} XLA f32)")


if __name__ == "__main__":
    main()
