"""Benchmark driver for Sionna-TPU.

Default (`python bench.py`, same as `--all`) runs every BASELINE.md
config, prints one JSON line {"metric", "value", "unit",
"vs_baseline"} per metric (FLAGSHIP first, so a single-line consumer
reads the headline number), and writes the collection to
BENCH_ALL.json.  `python bench.py NAME` runs a single named bench;
`python bench.py --mesh [N]` runs the flagship chunk data-parallel
over an N-device mesh via shard_map (psum'd error counters).

Flagship workload = the reference's own headline benchmark
(`/root/reference/tutorials/phy/Discover_Sionna.ipynb` cells 31/33/39):
TDL-A (100 ns, 3.5 GHz, 3 km/h) SISO link, 256-FFT / 14-symbol
resource grid with Kronecker pilots on symbols [2, 11], 16-QAM,
rate-1/2 5G LDPC (n=12288), RowColumn interleaver, LS estimation with
nearest-neighbor interpolation, LMMSE equalization, APP demapping,
BP-20 boxplus decoding.  The reference publishes 37.48 Mb/s for this
exact link in XLA mode on an RTX A6000; vs_baseline is measured
info-bit throughput / 37.48e6.

Other baselines: the coded-AWGN link's only published reference
number is 10.995 Mb/s in *graph* mode (Sionna_tutorial_part1.ipynb
cell 63; no XLA figure exists for that workload — the same notebook
measures XLA ~5.8x graph on a comparable link, so treat the ratio
accordingly).  Configs without any published reference number report
vs_baseline = null.

Measurement methodology (see docs in the verify skill): Monte-Carlo
iterations are fused on-device with ``lax.scan``; every timed call
fetches a scalar to the host (async dispatch through the axon tunnel
makes trailing block_until_ready unreliable); one untimed post-compile
call absorbs execution-path warmup.  Only integer/real scalars are
fetched (the axon backend cannot transfer complex arrays).  The
flagship fuses 32 MC iterations per timed call: each host-synced call
through the axon tunnel carries a fixed ~30 ms RPC cost that real
(non-tunneled) TPU deployments do not pay, so longer on-device loops
report the sustained device throughput rather than the tunnel
latency (round-2 measurements: 168 / 187 / 206 / 213 Mb/s at
n_scan=2/4/8/16 — the asymptote, not a methodology change: every
call is still host-synced and post-warmup; round 5 deepened the
fusion to 32).
"""

import json
import os
import sys
import time

import numpy as np
import jax

# Persistent XLA compilation cache: a fresh bench process otherwise
# re-pays the full compile/warmup bill (the 100k-triangle city solve
# alone costs minutes of XLA time).  Steady-state timings are
# unaffected — every timed call runs post-warmup executables.
if os.environ.get("SIONNA_TPU_NO_COMPILE_CACHE") != "1":
    _cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
    except Exception as _ex:  # option renamed/removed in a future JAX
        print(f"warning: persistent compile cache disabled ({_ex})",
              file=sys.stderr)

import jax.numpy as jnp

FLAGSHIP_BASELINE_BITS_PER_S = 37.48e6   # reference XLA, A6000
CODED_AWGN_GRAPH_BASELINE = 10.995e6     # reference graph, A6000


def _timed_calls(chunk, args_fn, n_calls):
    """Times host-synced calls of a jitted scalar-returning chunk."""
    int(chunk(*args_fn(0)))          # compile + sync
    int(chunk(*args_fn(999)))        # post-compile warmup
    t0 = time.perf_counter()
    acc = 0
    for r in range(n_calls):
        acc += int(chunk(*args_fn(1000 + r)))
    return time.perf_counter() - t0, acc


# ----------------------------------------------------------------- #
# 1. Flagship: TDL-A MIMO-OFDM coded link (reference notebook config)
# ----------------------------------------------------------------- #

def _flagship_step(batch, n_scan, fft_size=256, ldpc_engine="pallas",
                   vary_axes=()):
    """Builds the flagship link and returns (step_fn, k): step_fn is a
    pure (ebno_db, key) -> error-count function running ``n_scan``
    scan-fused MC iterations at ``batch`` blocks each (NOT jitted —
    callers wrap in jit or shard_map).  Under shard_map, pass the mesh
    axis names as ``vary_axes`` so the scan's initial error counter is
    marked device-varying (its body output is; an unvarying constant
    init trips shard_map's varying-manual-axes check)."""
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

    nbps, r = 4, 0.5
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
                        num_iter=20, engine=ldpc_engine)

    def step(ebno_db, key):
        no = ebnodb2no(ebno_db, nbps, r, rg)

        def body(carry, i):
            kk = jax.random.fold_in(key, i)
            k1, k2 = jax.random.split(kk)
            b = src([batch, 1, 1, k], key=k1)
            x_rg = rg_mapper(mapper(il(enc(b))))
            y = channel(x_rg, no, key=k2)
            h_hat, err_var = est(y, no)
            x_hat, no_eff = equ(y, h_hat, err_var, no)
            b_hat = dec(dil(demapper(x_hat, no_eff)))
            e = jnp.sum((b != b_hat).astype(jnp.int32))
            return carry + e.astype(carry.dtype), None

        init = jnp.int32(0)
        if vary_axes:
            init = jax.lax.pcast(init, tuple(vary_axes),
                                 to="varying")
        tot, _ = jax.lax.scan(body, init, jnp.arange(n_scan))
        return tot

    return step, k


def bench_flagship(batch=2048, n_scan=32, n_calls=2):
    step, k = _flagship_step(batch, n_scan)
    chunk = jax.jit(step)

    ebno = jnp.asarray(5.0, jnp.float32)
    key = jax.random.PRNGKey(0)
    dt, errs = _timed_calls(
        chunk, lambda i: (ebno, jax.random.fold_in(key, i)), n_calls)
    assert errs > 0
    tput = n_calls * n_scan * batch * k / dt
    return [{
        "metric": "flagship_tdla_mimo_ofdm_info_bit_throughput",
        "value": round(tput / 1e6, 3),
        "unit": "Mbit/s",
        "vs_baseline": round(tput / FLAGSHIP_BASELINE_BITS_PER_S, 3),
    }]


# ----------------------------------------------------------------- #
# 2a. Coded AWGN LDPC link (reference tutorial part-1 config)
# ----------------------------------------------------------------- #

def bench_coded_awgn(batch=2000, n_scan=10, n_calls=4):
    from sionna_tpu.phy import BinarySource, Mapper, Demapper, AWGN
    from sionna_tpu.phy.fec.ldpc import LDPC5GEncoder, LDPC5GDecoder
    from sionna_tpu.phy.utils import ebnodb2no

    nbps, k, n = 4, 1024, 2048
    src = BinarySource()
    enc = LDPC5GEncoder(k, n, num_bits_per_symbol=nbps)
    mapper = Mapper("qam", nbps)
    demapper = Demapper("app", "qam", nbps)
    # reference defaults: boxplus-phi, 20 iterations
    dec = LDPC5GDecoder(enc, num_iter=20, engine="pallas")
    awgn = AWGN()

    @jax.jit
    def chunk(ebno_db, key):
        no = ebnodb2no(ebno_db, nbps, k / n)

        def body(carry, i):
            kk = jax.random.fold_in(key, i)
            k1, k2 = jax.random.split(kk)
            b = src([batch, k], key=k1)
            y = awgn(mapper(enc(b)), no, key=k2)
            b_hat = dec(demapper(y, no))
            e = jnp.sum((b != b_hat).astype(jnp.int32))
            return carry + e.astype(carry.dtype), None

        tot, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(n_scan))
        return tot

    ebno = jnp.asarray(4.0, jnp.float32)
    key = jax.random.PRNGKey(0)
    dt, errs = _timed_calls(
        chunk, lambda i: (ebno, jax.random.fold_in(key, i)), n_calls)
    assert errs > 0
    tput = n_calls * n_scan * batch * k / dt
    return [{
        "metric": "coded_awgn_ldpc_mc_info_bit_throughput",
        "value": round(tput / 1e6, 3),
        "unit": "Mbit/s",
        "vs_baseline": round(tput / CODED_AWGN_GRAPH_BASELINE, 3),
    }]


# ----------------------------------------------------------------- #
# 2b. Uncoded 16-QAM AWGN sweep (BASELINE config 1)
# ----------------------------------------------------------------- #

def bench_uncoded_awgn(batch=8192, nbits=1024, n_scan=20, n_calls=4):
    from sionna_tpu.phy import BinarySource, Mapper, Demapper, AWGN
    from sionna_tpu.phy.utils import ebnodb2no

    nbps = 4
    src = BinarySource()
    mapper = Mapper("qam", nbps)
    demapper = Demapper("app", "qam", nbps, hard_out=True)
    awgn = AWGN()

    @jax.jit
    def chunk(ebno_db, key):
        no = ebnodb2no(ebno_db, nbps, 1.0)

        def body(carry, i):
            kk = jax.random.fold_in(key, i)
            k1, k2 = jax.random.split(kk)
            b = src([batch, nbits], key=k1)
            y = awgn(mapper(b), no, key=k2)
            b_hat = demapper(y, no)
            e = jnp.sum((b != b_hat).astype(jnp.int32))
            return carry + e.astype(carry.dtype), None

        tot, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(n_scan))
        return tot

    ebno = jnp.asarray(10.0, jnp.float32)
    key = jax.random.PRNGKey(0)
    dt, errs = _timed_calls(
        chunk, lambda i: (ebno, jax.random.fold_in(key, i)), n_calls)
    assert errs > 0
    tput = n_calls * n_scan * batch * nbits / dt
    return [{
        "metric": "uncoded_16qam_awgn_bit_throughput",
        "value": round(tput / 1e6, 3),
        "unit": "Mbit/s",
        "vs_baseline": None,
    }]


# ----------------------------------------------------------------- #
# 2c. Polar SC / SCL coded throughput (BASELINE config 2)
# ----------------------------------------------------------------- #

def bench_polar(n_scan=2, n_calls=3):
    from sionna_tpu.phy import BinarySource, Mapper, Demapper, AWGN
    from sionna_tpu.phy.fec.polar import Polar5GEncoder, Polar5GDecoder
    from sionna_tpu.phy.utils import ebnodb2no

    k, n = 512, 1024
    src = BinarySource()
    mapper = Mapper("qam", 2)
    demapper = Demapper("app", "qam", 2)
    awgn = AWGN()
    out = []
    # the SC tree is latency-bound: throughput scales ~linearly with
    # batch (8.1 -> 124.5 Mb/s from 512 -> 8192 on v5e); SCL-8 with
    # lazy path selection saturates near batch 4096 (15.9 / 19.8 /
    # 19.7 Mb/s decoder-only at 2048 / 4096 / 8192)
    for dec_type, list_size, batch in (("SC", None, 8192),
                                       ("SCL", 8, 4096)):
        enc = Polar5GEncoder(k, n)
        kwargs = {} if list_size is None else {"list_size": list_size}
        dec = Polar5GDecoder(enc, dec_type=dec_type, **kwargs)

        @jax.jit
        def chunk(ebno_db, key, enc=enc, dec=dec):
            no = ebnodb2no(ebno_db, 2, k / n)

            def body(carry, i):
                kk = jax.random.fold_in(key, i)
                k1, k2 = jax.random.split(kk)
                u = src([batch, k], key=k1)
                y = awgn(mapper(enc(u)), no, key=k2)
                u_hat = dec(demapper(y, no))
                e = jnp.sum((u != u_hat).astype(jnp.int32))
                return carry + e.astype(carry.dtype), None

            tot, _ = jax.lax.scan(body, jnp.int32(0),
                                  jnp.arange(n_scan))
            return tot

        ebno = jnp.asarray(1.0, jnp.float32)
        key = jax.random.PRNGKey(0)
        dt, errs = _timed_calls(
            chunk, lambda i: (ebno, jax.random.fold_in(key, i)),
            n_calls)
        assert errs > 0
        tput = n_calls * n_scan * batch * k / dt
        name = dec_type.lower() + ("" if list_size is None
                                   else f"{list_size}")
        out.append({
            "metric": f"polar5g_{name}_coded_info_bit_throughput",
            "value": round(tput / 1e6, 3),
            "unit": "Mbit/s",
            "vs_baseline": None,
        })
    return out


# ----------------------------------------------------------------- #
# 3. RT: path solve rays/s + radio map (BASELINE config 4)
# ----------------------------------------------------------------- #

def bench_rt():
    from sionna_tpu.rt import (load_scene, Transmitter, Receiver,
                               PlanarArray, PathSolver, RadioMapSolver)

    scene = load_scene("simple_street_canyon", frequency=3.5e9)
    scene.tx_array = PlanarArray(1, 1, pattern="iso", polarization="V")
    scene.rx_array = PlanarArray(1, 1, pattern="iso", polarization="V")
    scene.add(Transmitter("tx", [-20., 0., 10.]))
    scene.add(Receiver("rx", [20., 5., 1.5]))

    solver = PathSolver()
    max_depth, samples = 3, 200_000

    def median_time(fn, reps=3):
        # benchmark protocol (docs/PERFORMANCE.md): warmup once, then
        # median of >= 3 host-synced reps — single-shot RT timings
        # through the tunnel jitter by >10%
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    def canyon_solve():
        paths = solver(scene, max_depth=max_depth,
                       samples_per_src=samples)
        paths.cir(out_type="numpy")

    dt = median_time(canyon_solve)
    rays_per_s = samples * (max_depth + 1) / dt

    rm_solver = RadioMapSolver()
    rm_size = (200, 200)

    def rm_solve():
        rm = rm_solver(scene, cell_size=(1., 1.), size=rm_size,
                       center=(0., 0., 1.5), max_depth=2,
                       samples_per_src=100_000)
        np.asarray(rm.path_gain)

    dt_rm = median_time(rm_solve)
    # city-scale stress geometry (>=100k triangles, munich-class)
    from sionna_tpu.rt import make_city
    city = make_city(10, 10, subdiv=10)
    city.tx_array = PlanarArray(1, 1, pattern="iso", polarization="V")
    city.rx_array = PlanarArray(1, 1, pattern="iso", polarization="V")
    city.add(Transmitter("tx", [0., 0., 30.]))
    city.add(Receiver("rx", [0., 32., 1.5]))   # street intersection
    # 100k rays x depth 2 over 100k triangles: the clustered accel
    # structure (rt/accel.py) makes this the throughput sweet spot
    c_samples, c_depth = 100_000, 2

    def city_solve():
        paths = solver(city, max_depth=c_depth,
                       samples_per_src=c_samples)
        np.asarray(paths.tau)

    dt_city = median_time(city_solve)
    city_rays = c_samples * (c_depth + 1) / dt_city

    return [{
        "metric": "rt_path_solver_ray_segments_per_s",
        "value": round(rays_per_s / 1e6, 3),
        "unit": "Mrays/s",
        "vs_baseline": None,
    }, {
        "metric": "rt_city100k_ray_segments_per_s",
        "value": round(city_rays / 1e3, 3),
        "unit": "krays/s",
        "vs_baseline": None,
    }, {
        "metric": "rt_radio_map_cells_per_s",
        "value": round(rm_size[0] * rm_size[1] / dt_rm / 1e3, 3),
        "unit": "kcells/s",
        "vs_baseline": None,
    }]


# ----------------------------------------------------------------- #
# 4. SYS: multi-cell slot loop (BASELINE config 5)
# ----------------------------------------------------------------- #

def bench_sys(n_slots=50):
    from sionna_tpu.sys import (PHYAbstraction,
                                OuterLoopLinkAdaptation,
                                gen_hexgrid_topology)

    ut_loc, bs_loc, *_ = gen_hexgrid_topology(
        batch_size=1, num_rings=1, num_ut_per_sector=4,
        scenario="umi")
    num_ut = ut_loc.shape[1]
    d = np.linalg.norm(np.asarray(ut_loc)[0][:, None]
                       - np.asarray(bs_loc)[0][None], axis=-1)
    serving = d.min(axis=1)
    interf = d.sum(axis=1) - serving
    sinr_base = (interf / serving) ** 2 / bs_loc.shape[1]

    phy_abs = PHYAbstraction()
    olla = OuterLoopLinkAdaptation(phy_abs, num_ut, bler_target=0.1)
    n_re_j = jnp.asarray(np.full((num_ut,), 1000), jnp.int32)
    sinr_base_j = jnp.asarray(sinr_base, jnp.float32)

    # The whole slot loop (fading draw -> OLLA -> ILLA search -> PHY
    # abstraction -> HARQ feedback) is ONE lax.scan program: a single
    # device launch per n_slots instead of per-slot host round trips
    # (OLLA.step is the functional scan-fusable API).
    @jax.jit
    def run_slots(state, key):
        def body(carry, s):
            state, harq = carry
            kk = jax.random.fold_in(key, s)
            k1, k2 = jax.random.split(kk)
            sinr_eff = sinr_base_j * jax.random.exponential(
                k1, (num_ut,), jnp.float32)
            state, mcs = olla.step(state, n_re_j,
                                   harq_feedback=harq,
                                   sinr_eff=sinr_eff)
            bits, harq_j, *_ = phy_abs(mcs, sinr_eff=sinr_eff,
                                       num_allocated_re=n_re_j,
                                       key=k2)
            return (state, harq_j), jnp.sum(bits)

        harq0 = jnp.full((num_ut,), -1, jnp.int32)
        (state, _), bits = jax.lax.scan(
            body, (state, harq0), jnp.arange(n_slots))
        return state, jnp.sum(bits)

    state = olla.init_state()
    _, b = run_slots(state, jax.random.PRNGKey(0))  # compile
    int(b)
    _, b = run_slots(state, jax.random.PRNGKey(1))  # warmup
    int(b)
    t0 = time.perf_counter()
    tot_bits = 0
    n_calls = 3
    for c in range(n_calls):
        state, b = run_slots(state, jax.random.PRNGKey(2 + c))
        tot_bits += int(b)
    dt = time.perf_counter() - t0
    n_slots = n_slots * n_calls
    assert tot_bits > 0
    return [{
        "metric": "sys_multicell_slots_per_s",
        "value": round(n_slots / dt, 3),
        "unit": "slots/s",
        "vs_baseline": None,
    }]


# ----------------------------------------------------------------- #
# 5. LDPC decoder-only iteration rate
# ----------------------------------------------------------------- #

def bench_ldpc_iters(batch=2048, num_iter=20, n_scan=4, n_calls=3):
    from sionna_tpu.phy.fec.ldpc import LDPC5GEncoder, LDPC5GDecoder

    k, n = 6144, 12288
    enc = LDPC5GEncoder(k, n)
    dec = LDPC5GDecoder(enc, hard_out=True, cn_update="boxplus",
                        num_iter=num_iter, engine="pallas")
    key = jax.random.PRNGKey(0)
    llr = jax.random.normal(key, (batch, n), jnp.float32) * 4.0

    # n_scan decodes fused per call (same amortization as the
    # flagship): the decoder-only rate was previously dominated by
    # the ~30 ms per-call tunnel RPC (608 vs 877 kiter/s measured)
    @jax.jit
    def chunk(llr, eps):
        def body(carry, i):
            out = dec(llr + eps * (1. + i.astype(jnp.float32)))
            return carry + jnp.sum(out).astype(jnp.int32), None
        tot, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(n_scan))
        return tot

    dt, _ = _timed_calls(
        chunk, lambda i: (llr, jnp.float32(1e-6 * i)), n_calls)
    return [{
        "metric": "ldpc_bp_codeword_iterations_per_s",
        "value": round(n_calls * n_scan * batch * num_iter / dt / 1e3,
                       3),
        "unit": "kiter/s",
        "vs_baseline": None,
    }]


def bench_mesh(n_dev=None, batch_per_dev=1024, n_scan=8, n_calls=2,
               fft_size=256, ldpc_engine="pallas"):
    """Data-parallel flagship over a device mesh: the flagship chunk
    runs under ``shard_map`` with per-device key shards and a psum'd
    error counter (the analog of the reference's MirroredStrategy
    path, /root/reference/src/sionna/phy/utils/misc.py:618-655).

    On a multi-chip TPU slice this measures DP scaling; on the
    8-device virtual CPU mesh (JAX_PLATFORMS=cpu XLA_FLAGS=
    --xla_force_host_platform_device_count=8) it asserts correctness
    of the sharded program — `tests/test_bench_mesh.py` runs a small
    configuration in CI."""
    from functools import partial
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    devs = jax.devices()
    if n_dev is None:
        n_dev = len(devs)
    if len(devs) < n_dev:
        return [{"metric": "flagship_mesh_info_bit_throughput",
                 "error": f"need {n_dev} devices, have {len(devs)}"}]
    mesh = Mesh(np.array(devs[:n_dev]), ("dp",))
    step, k = _flagship_step(batch_per_dev, n_scan,
                             fft_size=fft_size,
                             ldpc_engine=ldpc_engine,
                             vary_axes=("dp",))

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(P(), P("dp")),
             out_specs=P())
    def chunk(ebno_db, keys):
        e = step(ebno_db, keys[0])
        return jax.lax.psum(e, "dp")

    ebno = jnp.asarray(5.0, jnp.float32)
    root = jax.random.PRNGKey(0)

    def args(i):
        return (ebno,
                jax.random.split(jax.random.fold_in(root, i), n_dev))

    dt, errs = _timed_calls(chunk, args, n_calls)
    assert errs > 0
    tput = n_calls * n_scan * batch_per_dev * n_dev * k / dt
    return [{
        "metric": "flagship_mesh_info_bit_throughput",
        "value": round(tput / 1e6, 3),
        "unit": "Mbit/s",
        "vs_baseline": round(tput / FLAGSHIP_BASELINE_BITS_PER_S, 3),
        "n_devices": n_dev,
    }]


BENCHES = {
    "flagship": bench_flagship,
    "coded_awgn": bench_coded_awgn,
    "uncoded_awgn": bench_uncoded_awgn,
    "polar": bench_polar,
    "rt": bench_rt,
    "sys": bench_sys,
    "ldpc_iters": bench_ldpc_iters,
}


def _run_all():
    """Every BASELINE config; one JSON line per metric (flagship
    first so single-line consumers still read the headline number);
    the collection also lands in BENCH_ALL.json."""
    results = []
    for name, fn in BENCHES.items():
        try:
            rs = fn()
        except Exception as ex:  # keep going; record the failure
            rs = [{"metric": name, "error":
                   f"{type(ex).__name__}: {ex}"}]
        for r in rs:
            print(json.dumps(r), flush=True)
        results.extend(rs)
    # mesh scaling is only meaningful with >1 device attached
    if len(jax.devices()) > 1:
        try:
            rs = bench_mesh()
        except Exception as ex:
            rs = [{"metric": "flagship_mesh", "error":
                   f"{type(ex).__name__}: {ex}"}]
        for r in rs:
            print(json.dumps(r), flush=True)
        results.extend(rs)
    with open("BENCH_ALL.json", "w") as f:
        json.dump(results, f, indent=1)


def main():
    arg = sys.argv[1] if len(sys.argv) > 1 else "--all"
    if arg == "--all":
        _run_all()
        return
    if arg == "--mesh":
        n_dev = int(sys.argv[2]) if len(sys.argv) > 2 else None
        for r in bench_mesh(n_dev=n_dev):
            print(json.dumps(r))
        return
    for r in BENCHES[arg]():
        print(json.dumps(r))


if __name__ == "__main__":
    main()
