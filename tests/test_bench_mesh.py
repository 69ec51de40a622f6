"""CI correctness check for the mesh-mode benchmark: the flagship
chunk compiles and runs under shard_map on the 8-device virtual CPU
mesh with a psum'd error counter (perf numbers are only meaningful on
real multi-chip hardware — bench.py --mesh N)."""

import jax
import pytest


@pytest.mark.slow
def test_bench_mesh_small_runs_on_cpu_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    import bench
    # tiny config: 32-FFT grid, 2 blocks/device, 1 scan iteration,
    # XLA lifted LDPC engine (pallas interpret mode is needlessly
    # slow on CPU)
    out = bench.bench_mesh(n_dev=8, batch_per_dev=2, n_scan=1,
                           n_calls=1, fft_size=32,
                           ldpc_engine="lifted")
    assert out[0].get("error") is None, out
    assert out[0]["value"] > 0
    assert out[0]["n_devices"] == 8
