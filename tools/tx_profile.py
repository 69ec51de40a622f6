"""TX-chain stage microbenchmark + LDPC encoder variants (flagship
shapes).  Run ALONE on the TPU (docs/PERFORMANCE.md protocol).

Stages are cumulative prefixes of the flagship TX; each timed call is
scan-fused (N_SCAN iterations) and host-synced via a scalar fetch.
Encoder variants:
  gather-f32 : shipped _block_matvec ([B, E, Z] gather + f32 einsum)
  gather-bf16: same with bf16 gather/einsum (row sums <= 19 are exact
               in bf16; mod-2 applied after)
  roll-add   : per-row unrolled roll/XOR in the lifted domain (the
               decoder-engine formulation)
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

BATCH, N_SCAN = 2048, 8


def timed(chunk, n_calls=3):
    key = jax.random.PRNGKey(0)
    int(chunk(jax.random.fold_in(key, 0)))
    int(chunk(jax.random.fold_in(key, 999)))
    t0 = time.perf_counter()
    for r in range(n_calls):
        int(chunk(jax.random.fold_in(key, 1000 + r)))
    return (time.perf_counter() - t0) / n_calls / N_SCAN * 1e3


def main():
    from sionna_tpu.phy import BinarySource, Mapper
    from sionna_tpu.phy.ofdm import ResourceGrid, ResourceGridMapper
    from sionna_tpu.phy.fec.ldpc import LDPC5GEncoder
    from sionna_tpu.phy.fec.interleaving import RowColumnInterleaver

    nbps = 4
    rg = ResourceGrid(num_ofdm_symbols=14, fft_size=256,
                      subcarrier_spacing=30e3, num_tx=1,
                      num_streams_per_tx=1, cyclic_prefix_length=16,
                      pilot_pattern="kronecker",
                      pilot_ofdm_symbol_indices=[2, 11])
    n = int(rg.num_data_symbols) * nbps
    k = int(n // 2)
    src = BinarySource()
    enc = LDPC5GEncoder(k, n)
    il = RowColumnInterleaver(row_depth=nbps)
    mapper = Mapper("qam", nbps)
    rg_mapper = ResourceGridMapper(rg)

    def chain(stop):
        def chunk(key):
            def body(carry, i):
                kk = jax.random.fold_in(key, i)
                b = src([BATCH, 1, 1, k], key=kk)
                x = b
                if stop >= 1:
                    x = enc(x)
                if stop >= 2:
                    x = il(x)
                if stop >= 3:
                    x = mapper(x)
                if stop >= 4:
                    x = rg_mapper(x)
                if jnp.iscomplexobj(x):
                    e = jnp.sum(jnp.abs(x) ** 2).astype(jnp.int32)
                else:
                    e = jnp.sum(x).astype(jnp.int32)
                return carry + e, None
            tot, _ = jax.lax.scan(body, jnp.int32(0),
                                  jnp.arange(N_SCAN))
            return tot
        return jax.jit(chunk)

    names = ["source", "+encode", "+interleave", "+map", "+rg_map"]
    prev = 0.
    for stop, name in enumerate(names):
        dt = timed(chain(stop))
        print(f"{name:12s} {dt:7.2f} ms/iter  (delta "
              f"{dt - prev:+6.2f})", flush=True)
        prev = dt

    # ---------------- encoder variants ----------------
    z = enc._z

    def enc_bf16(u_fill):
        batch = u_fill.shape[0]
        x16 = u_fill.astype(jnp.bfloat16)

        def mv(gidx, rowsum, x_flat):
            gathered = jnp.take(x_flat, jnp.asarray(gidx), axis=1)
            return jnp.einsum(
                "bez,er->brz", gathered,
                jnp.asarray(rowsum, jnp.bfloat16))

        lam = jnp.mod(mv(enc._gA, enc._rA, x16).astype(jnp.float32), 2)
        lam_sum = jnp.mod(jnp.sum(lam, axis=1), 2)
        t = enc._apply(lam_sum, enc._pm_a + enc._pm_b_inv)
        pa0 = enc._apply(lam_sum, enc._pm_b_inv)
        pa1 = jnp.mod(lam[:, 0] + t, 2)
        pa2 = jnp.mod(t + lam[:, 2] + lam[:, 3], 2)
        pa3 = jnp.mod(t + lam[:, 3], 2)
        p_a = jnp.stack([pa0, pa1, pa2, pa3], axis=1)
        pb = (mv(enc._gC1, enc._rC1, x16).astype(jnp.float32)
              + mv(enc._gC2, enc._rC2,
                   p_a.reshape(batch, 4 * z).astype(jnp.bfloat16)
                   ).astype(jnp.float32))
        p_b = jnp.mod(pb, 2)
        return jnp.concatenate(
            [u_fill, p_a.reshape(batch, 4 * z),
             p_b.reshape(batch, -1)], axis=1)

    def enc_rolladd(u_fill):
        batch = u_fill.shape[0]
        xs = [u_fill[:, c * z:(c + 1) * z]
              for c in range(enc._k_b)]

        def rows_sum(entries, srcs, num_rows):
            rs, cs, ss = entries
            acc = [None] * num_rows
            for r, c, s in zip(rs, cs, ss):
                v = jnp.roll(srcs[c], -int(s), axis=-1)
                acc[r] = v if acc[r] is None else acc[r] + v
            return [jnp.zeros((batch, z), u_fill.dtype)
                    if a is None else a for a in acc]

        lam = rows_sum(enc._A, xs, 4)
        lam = [jnp.mod(a, 2) for a in lam]
        lam_sum = jnp.mod(lam[0] + lam[1] + lam[2] + lam[3], 2)
        t = enc._apply(lam_sum, enc._pm_a + enc._pm_b_inv)
        pa0 = enc._apply(lam_sum, enc._pm_b_inv)
        pa1 = jnp.mod(lam[0] + t, 2)
        pa2 = jnp.mod(t + lam[2] + lam[3], 2)
        pa3 = jnp.mod(t + lam[3], 2)
        p_a = [pa0, pa1, pa2, pa3]
        pb1 = rows_sum(enc._C1, xs, enc._m_b - 4)
        pb2 = rows_sum(enc._C2, p_a, enc._m_b - 4)
        p_b = [jnp.mod(a + b2, 2) for a, b2 in zip(pb1, pb2)]
        return jnp.concatenate(
            [u_fill] + p_a + p_b, axis=1)

    k_fill = enc._k_ldpc - k
    key0 = jax.random.PRNGKey(3)
    u = jax.random.bernoulli(key0, 0.5, (BATCH, k)).astype(jnp.float32)
    u_fill = jnp.concatenate(
        [u, jnp.zeros((BATCH, k_fill), jnp.float32)], 1)
    ref = np.asarray(jax.jit(enc._encode_core)(u_fill))

    for name, fn in (("gather-f32", enc._encode_core),
                     ("gather-bf16", enc_bf16),
                     ("roll-add", enc_rolladd)):
        @jax.jit
        def chunk(key, fn=fn):
            def body(carry, i):
                kk = jax.random.fold_in(key, i)
                b = jax.random.bernoulli(
                    kk, 0.5, (BATCH, k)).astype(jnp.float32)
                uf = jnp.concatenate(
                    [b, jnp.zeros((BATCH, k_fill), jnp.float32)], 1)
                c = fn(uf)
                return carry + jnp.sum(c).astype(jnp.int32), None
            tot, _ = jax.lax.scan(body, jnp.int32(0),
                                  jnp.arange(N_SCAN))
            return tot
        out = np.asarray(jax.jit(fn)(u_fill))
        exact = bool(np.array_equal(out, ref))
        dt = timed(chunk)
        print(f"encoder {name:12s} {dt:7.2f} ms/iter  "
              f"exact={exact}", flush=True)


if __name__ == "__main__":
    main()
