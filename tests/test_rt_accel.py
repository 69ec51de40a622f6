"""Cluster-culling acceleration structure vs the dense sweep.

The accel path (sionna_tpu/rt/accel.py) must agree exactly with the
plain dense Moller-Trumbore sweep: identical nearest-hit distances /
triangle ids, identical occlusion verdicts, identical shoot-and-
bounce traces, and identical end-to-end paths when forced on a small
scene."""

import numpy as np
import pytest

import jax.numpy as jnp

import sionna_tpu.rt.solver as solver_mod
from sionna_tpu.rt import (PathSolver, PlanarArray, Transmitter,
                           Receiver, load_scene)
from sionna_tpu.rt.accel import (
    build_accel, cluster_permutation, nearest_hit_accel,
    any_blocking_hit_accel, _cluster_permutation_numpy, _native_lib)
from sionna_tpu.rt.solver import nearest_hit, any_blocking_hit, _trace


def _random_soup(num_tri, rng, extent=50.):
    base = rng.uniform(-extent, extent, (num_tri, 1, 3))
    tri = base + rng.uniform(-2., 2., (num_tri, 3, 3))
    return tri.astype(np.float64)


def _random_rays(num_rays, rng, extent=60.):
    o = rng.uniform(-extent, extent, (num_rays, 3))
    d = rng.normal(size=(num_rays, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o.astype(np.float64), d.astype(np.float64)


def test_cluster_permutation_is_permutation():
    rng = np.random.default_rng(0)
    tri = _random_soup(1000, rng)
    perm = cluster_permutation(tri, 64)
    assert sorted(perm.tolist()) == list(range(1000))


def test_native_and_numpy_builders_agree():
    if _native_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(1)
    tri = _random_soup(777, rng)
    p_native = cluster_permutation(tri, 32)
    p_numpy = _cluster_permutation_numpy(tri.astype(np.float32), 32)
    # Median splits may tie-break differently; require both to be
    # permutations with identical cluster bounding volumes.
    assert sorted(p_native.tolist()) == list(range(777))
    assert sorted(p_numpy.tolist()) == list(range(777))

    def volumes(perm):
        t = tri[perm]
        pad = (-len(perm)) % 32
        t = np.concatenate([t, np.zeros((pad, 3, 3))])
        t = t.reshape(-1, 32, 9)
        return np.sort((t.reshape(len(t), -1, 3).max(axis=1)
                        - t.reshape(len(t), -1, 3).min(axis=1))
                       .prod(axis=-1))
    # Same algorithm -> same multiset of cluster volumes (up to ties)
    np.testing.assert_allclose(volumes(p_native), volumes(p_numpy),
                               rtol=0.5, atol=1e-6)


@pytest.mark.parametrize("num_tri,num_rays", [(500, 257), (3000, 64)])
def test_nearest_hit_matches_dense(num_tri, num_rays):
    rng = np.random.default_rng(2)
    tri_np = _random_soup(num_tri, rng)
    o_np, d_np = _random_rays(num_rays, rng)
    tri = jnp.asarray(tri_np)
    o, d = jnp.asarray(o_np), jnp.asarray(d_np)
    accel = build_accel(tri_np, cluster_size=64)

    t_d, i_d, h_d = nearest_hit(o, d, tri)
    t_a, i_a, h_a = nearest_hit_accel(o, d, accel, ray_chunk=100)

    np.testing.assert_array_equal(np.asarray(h_d), np.asarray(h_a))
    hit = np.asarray(h_d)
    np.testing.assert_allclose(np.asarray(t_d)[hit],
                               np.asarray(t_a)[hit], rtol=1e-9)
    # ids must agree wherever the nearest triangle is unambiguous
    amb = np.zeros_like(hit)
    np.testing.assert_array_equal(
        np.asarray(i_d)[hit & ~amb], np.asarray(i_a)[hit & ~amb])


def test_any_blocking_hit_matches_dense():
    rng = np.random.default_rng(3)
    tri_np = _random_soup(1500, rng)
    o_np, _ = _random_rays(400, rng)
    e_np, _ = _random_rays(400, rng)
    seg = e_np - o_np
    tri = jnp.asarray(tri_np)
    o, s = jnp.asarray(o_np), jnp.asarray(seg)
    accel = build_accel(tri_np, cluster_size=64)

    b_d = np.asarray(any_blocking_hit(o, s, tri))
    b_a = np.asarray(any_blocking_hit_accel(o, s, accel,
                                            ray_chunk=128))
    np.testing.assert_array_equal(b_d, b_a)

    # with exclusions
    excl = jnp.asarray(
        rng.integers(-1, 1500, (400, 3)).astype(np.int64))
    b_d = np.asarray(any_blocking_hit(o, s, tri, excl_ids=excl))
    b_a = np.asarray(any_blocking_hit_accel(o, s, accel,
                                            excl_ids=excl))
    np.testing.assert_array_equal(b_d, b_a)


def test_small_kmax_repair_path_is_exact():
    """With k_max far below the entered-cluster counts, the dense
    repair cond must fire and still give exact results."""
    rng = np.random.default_rng(7)
    tri_np = _random_soup(4000, rng)
    o_np, d_np = _random_rays(300, rng)
    tri = jnp.asarray(tri_np)
    o, d = jnp.asarray(o_np), jnp.asarray(d_np)
    accel = build_accel(tri_np, cluster_size=32)
    assert accel.num_clusters > 8

    t_d, i_d, h_d = nearest_hit(o, d, tri)
    t_a, i_a, h_a = nearest_hit_accel(o, d, accel, k_max=2, group=2)
    np.testing.assert_array_equal(np.asarray(h_d), np.asarray(h_a))
    hit = np.asarray(h_d)
    np.testing.assert_allclose(np.asarray(t_d)[hit],
                               np.asarray(t_a)[hit], rtol=1e-9)
    np.testing.assert_array_equal(np.asarray(i_d)[hit],
                                  np.asarray(i_a)[hit])

    e_np, _ = _random_rays(300, rng)
    seg = jnp.asarray(e_np - o_np)
    b_d = np.asarray(any_blocking_hit(o, seg, tri))
    b_a = np.asarray(any_blocking_hit_accel(o, seg, accel, k_max=2,
                                            group=2))
    np.testing.assert_array_equal(b_d, b_a)


def test_trace_matches_dense():
    rng = np.random.default_rng(4)
    tri_np = _random_soup(800, rng, extent=20.)
    tri = jnp.asarray(tri_np)
    normals = solver_mod._tri_normals(tri)
    o_np, d_np = _random_rays(200, rng, extent=10.)
    o, d = jnp.asarray(o_np), jnp.asarray(d_np)
    accel = build_accel(tri_np)

    ids_d = np.asarray(_trace(tri, normals, o, d, 3))
    ids_a = np.asarray(_trace(tri, normals, o, d, 3, accel=accel))
    np.testing.assert_array_equal(ids_d, ids_a)


def test_path_solver_end_to_end_accel_vs_dense(monkeypatch):
    """Forcing the accel on the street canyon must reproduce the
    dense solver's paths bit-for-bit at the path level."""
    scene = load_scene("simple_street_canyon", frequency=3.5e9)
    scene.tx_array = PlanarArray(num_rows=1, num_cols=1)
    scene.rx_array = PlanarArray(num_rows=1, num_cols=1)
    scene.add(Transmitter("tx", position=[-20., 4., 10.]))
    scene.add(Receiver("rx", position=[30., -3., 1.5]))

    solver = PathSolver()
    kwargs = dict(max_depth=2, samples_per_src=2000,
                  diffraction=True, max_num_wedges=200)
    paths_dense = solver(scene, **kwargs)
    monkeypatch.setattr(solver_mod, "ACCEL_MIN_TRIS", 1)
    paths_accel = PathSolver()(scene, **kwargs)

    np.testing.assert_array_equal(paths_dense.valid,
                                  paths_accel.valid)
    np.testing.assert_allclose(paths_dense.a, paths_accel.a,
                               rtol=1e-5, atol=1e-12)
    np.testing.assert_allclose(
        np.where(paths_dense.valid, paths_dense.tau, 0.),
        np.where(paths_accel.valid, paths_accel.tau, 0.),
        rtol=1e-9, atol=0.)
