"""City-scale ray-tracing regression: a procedural Manhattan grid
standing in for the upstream munich asset (SURVEY.md 2.12).

The fast test exercises the chunked intersector on a mid-size city;
the slow test runs the >=100k-triangle stress geometry end to end
(path solver + radio map) and checks throughput sanity."""


import numpy as np
import pytest

from sionna_tpu.rt import (Transmitter, Receiver, PlanarArray,
                           PathSolver, RadioMapSolver, make_city)


def _setup(scene):
    scene.tx_array = PlanarArray(1, 1, pattern="iso",
                                 polarization="V")
    scene.rx_array = PlanarArray(1, 1, pattern="iso",
                                 polarization="V")
    # tx above the central north-south street; rx at a street
    # intersection one block north (both in the 12 m street gaps of
    # the 32 m block pitch, for any grid size)
    scene.add(Transmitter("tx", [0., 0., 30.]))
    scene.add(Receiver("rx", [0., 32., 1.5]))
    return scene


def test_city_paths_small():
    """8x8-block city (~2.6k triangles — ABOVE the accel threshold,
    so the clustered path runs in the default tier): paths exist,
    delays are physical, and the strongest path beats free-space
    loss bounds.  Sized for the default-tier wall-time budget
    (tests/tier_manifest.py); the 100k-triangle stress scene below
    is the slow-tier counterpart."""
    from sionna_tpu.rt.solver import ACCEL_MIN_TRIS
    sc = _setup(make_city(8, 8, subdiv=2))
    assert sc.num_triangles > ACCEL_MIN_TRIS
    paths = PathSolver()(sc, max_depth=2, samples_per_src=1200)
    valid = np.asarray(paths.valid)[0, 0]
    assert valid.sum() >= 1
    tau = np.asarray(paths.tau)[0, 0][valid]
    d_min = np.linalg.norm(np.array([0., 32., 1.5])
                           - np.array([0., 0., 30.]))
    assert np.all(tau * 3e8 >= d_min - 1e-3)
    a = np.asarray(paths.cir(out_type="numpy")[0])[0, 0, 0, 0, :, 0]
    p = np.abs(a[valid]) ** 2
    lam = sc.wavelength
    assert p.max() <= (lam / (4 * np.pi * d_min)) ** 2 * 1.001


@pytest.mark.slow
def test_city_100k_triangles():
    """>=100k-triangle stress scene: the chunked Moller-Trumbore path
    must complete a depth-2 solve and a coarse radio map."""
    sc = _setup(make_city(10, 10, subdiv=10))
    assert sc.num_triangles >= 100_000
    paths = PathSolver()(sc, max_depth=2, samples_per_src=2000,
                         max_num_paths_per_src=2000)
    np.asarray(paths.a)
    assert np.asarray(paths.valid).sum() >= 1
    # (throughput is measured by bench.py on TPU; a wall-clock
    # assertion here is meaningless on a contended CI box)

    rm = RadioMapSolver()(sc, cell_size=(16., 16.), max_depth=1,
                          samples_per_src=1000)
    pg = np.asarray(rm.path_gain)
    assert np.isfinite(pg).all() and (pg > 0).any()
