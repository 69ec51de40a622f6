"""LDPC Pallas-kernel tuning sweep (flagship decode config).

Measures decoder-only throughput (codeword-iterations/s) for the
flagship workload (BG1, k=6144, n=12288, BP-20) across kernel knobs:
batch tile, message dtype (f32 vs bf16), and CN-update mode.  Run
ALONE on the attached TPU (see docs/PERFORMANCE.md benchmark
protocol):

    python tools/ldpc_tune.py [--quick]

Each variant is also checked for bit-exactness (or error counts, for
bf16) against the f32 XLA lifted engine on the same LLRs.
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


def timed(fn, args, n_calls=3):
    r = fn(*args)
    jax.block_until_ready(r)
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        r = fn(*args)
        jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n_calls, r


def main():
    quick = "--quick" in sys.argv
    k, n = 6144, 12288
    batch, num_iter = 2048, 20
    enc = LDPC5GEncoder(k, n)
    # build via the decoder to get the pruned lifted structure
    dec = LDPC5GDecoder(enc, hard_out=True, cn_update="boxplus",
                        num_iter=num_iter, engine="pallas")
    lifted = dec._lifted
    nv = lifted._num_vns
    print(f"z={lifted._z} edges={len(lifted._edges)} "
          f"col_blocks={lifted._n_col_blocks} num_vns={nv}")

    key = jax.random.PRNGKey(0)
    llr_int = jax.random.normal(key, (batch, nv), jnp.float32) * 3.0

    # ground truth: XLA lifted engine, f32
    ref_fn = jax.jit(lambda x: lifted.decode(x, num_iter))
    dt_ref, marg_ref = timed(ref_fn, (llr_int,))
    hard_ref = np.asarray(marg_ref < 0)
    print(f"lifted-XLA f32:            {dt_ref*1e3:8.1f} ms  "
          f"{batch*num_iter/dt_ref/1e3:7.1f} kiter/s")

    results = []
    tiles = (None, 8, 16, 32) if not quick else (None, 16)
    for dtype_name, dtype in (("f32", jnp.float32),
                              ("bf16", jnp.bfloat16)):
        llr_d = llr_int.astype(dtype)
        for bt in tiles:
            label = f"pallas {dtype_name} tile={bt or 'auto'}"
            try:
                fn = jax.jit(lambda x, bt=bt: _lifted_pallas_decode(
                    lifted, x, num_iter, batch_tile=bt))
                dt, marg = timed(fn, (llr_d,))
            except Exception as ex:
                print(f"{label:26s} FAILED: {type(ex).__name__}: "
                      f"{str(ex)[:120]}")
                continue
            hard = np.asarray(marg.astype(jnp.float32) < 0)
            nbad = int((hard != hard_ref).sum())
            kiter = batch * num_iter / dt / 1e3
            print(f"{label:26s} {dt*1e3:8.1f} ms  {kiter:7.1f} "
                  f"kiter/s  hard-mismatch={nbad}")
            results.append((label, kiter, nbad))

    best = max(results, key=lambda r: r[1]) if results else None
    if best:
        print(f"\nbest: {best[0]}  {best[1]:.1f} kiter/s")


if __name__ == "__main__":
    main()
