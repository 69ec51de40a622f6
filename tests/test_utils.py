"""Tests for phy.utils (tensors, metrics, misc)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sionna_tpu.phy import utils
from sionna_tpu.phy.utils import (
    expand_to_rank, insert_dims, flatten_dims, flatten_last_dims,
    split_dim, flatten_multi_index, gather_from_batched_indices,
    count_errors, count_block_errors, compute_ber, compute_bler,
    ebnodb2no, db_to_lin, lin_to_db, hard_decisions, complex_normal,
    inv_cholesky, matrix_pinv)


def test_expand_to_rank():
    x = jnp.zeros((3, 4))
    assert expand_to_rank(x, 4, axis=-1).shape == (3, 4, 1, 1)
    assert expand_to_rank(x, 4, axis=0).shape == (1, 1, 3, 4)
    assert expand_to_rank(x, 2, axis=0).shape == (3, 4)


def test_insert_dims():
    x = jnp.zeros((3, 4))
    assert insert_dims(x, 2, axis=1).shape == (3, 1, 1, 4)
    assert insert_dims(x, 1, axis=-1).shape == (3, 4, 1)


def test_flatten_split():
    x = jnp.arange(24).reshape(2, 3, 4)
    y = flatten_dims(x, 2, 0)
    assert y.shape == (6, 4)
    z = flatten_last_dims(x, 2)
    assert z.shape == (2, 12)
    w = split_dim(z, (3, 4), 1)
    assert w.shape == (2, 3, 4)
    np.testing.assert_array_equal(np.asarray(w), np.asarray(x))


def test_flatten_multi_index():
    idx = jnp.asarray([[1, 2], [0, 3]])
    flat = flatten_multi_index(idx, (4, 5))
    np.testing.assert_array_equal(np.asarray(flat), [7, 3])


def test_gather_from_batched_indices():
    params = jnp.arange(20).reshape(4, 5)
    indices = jnp.asarray([[1, 2], [3, 4]])
    out = gather_from_batched_indices(params, indices)
    np.testing.assert_array_equal(np.asarray(out), [7, 19])


def test_metrics():
    b = jnp.asarray([[0., 1., 0.], [1., 1., 1.]])
    bh = jnp.asarray([[0., 0., 0.], [1., 1., 1.]])
    assert int(count_errors(b, bh)) == 1
    assert int(count_block_errors(b, bh)) == 1
    assert float(compute_ber(b, bh)) == pytest.approx(1 / 6)
    assert float(compute_bler(b, bh)) == pytest.approx(1 / 2)


def test_db_conversions():
    assert float(db_to_lin(10.0)) == pytest.approx(10.0)
    assert float(lin_to_db(100.0)) == pytest.approx(20.0)


def test_ebnodb2no():
    # QPSK uncoded: no = 1 / (ebno * 2)
    no = float(ebnodb2no(10.0, 2, 1.0))
    assert no == pytest.approx(1 / (10 * 2), rel=1e-5)


def test_hard_decisions():
    llr = jnp.asarray([-1.2, 0.3, 2.0, -0.1])
    np.testing.assert_array_equal(np.asarray(hard_decisions(llr)),
                                  [0., 1., 1., 0.])


def test_complex_normal_variance():
    x = complex_normal((100000,), var=4.0)
    var = float(jnp.mean(jnp.abs(x) ** 2))
    assert var == pytest.approx(4.0, rel=0.05)
    assert x.dtype == jnp.complex64


def test_inv_cholesky():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(3, 4, 4)) + 1j * rng.normal(size=(3, 4, 4))
    h = a @ np.conj(np.swapaxes(a, -2, -1)) + 4 * np.eye(4)
    l_inv = np.asarray(inv_cholesky(jnp.asarray(h, jnp.complex128)))
    l = np.linalg.cholesky(h)
    np.testing.assert_allclose(l_inv @ l, np.broadcast_to(np.eye(4), l.shape),
                               atol=1e-10)


def test_matrix_pinv():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(2, 6, 3)) + 1j * rng.normal(size=(2, 6, 3))
    pinv = np.asarray(matrix_pinv(jnp.asarray(a, jnp.complex128)))
    np.testing.assert_allclose(pinv @ a,
                               np.broadcast_to(np.eye(3), (2, 3, 3)),
                               atol=1e-10)


def test_profiler_phases():
    import time as _time
    from sionna_tpu.phy.utils import Profiler
    prof = Profiler()
    with prof.phase("a"):
        _time.sleep(0.01)
    with prof.phase("a"):
        _time.sleep(0.01)
    with prof.phase("b"):
        with prof.phase("inner"):
            pass
    assert prof.counts["a"] == 2
    assert prof.times["a"] >= 0.02
    assert "inner" in prof.times
    s = prof.summary()
    assert "a" in s and "mean [ms]" in s
    d = prof.as_dict()
    assert d["b"]["count"] == 1
    prof.reset()
    assert prof.summary() == "(no phases recorded)"


def test_sim_ber_profiler_integration():
    import jax
    import jax.numpy as jnp
    from sionna_tpu.phy.utils import Profiler, sim_ber

    def mc_fun(batch_size, ebno_db, key):
        b = jax.random.bernoulli(key, 0.5, (batch_size, 16))
        b = b.astype(jnp.float32)
        flip = jax.random.bernoulli(
            jax.random.fold_in(key, 7), 0.05, b.shape)
        return b, jnp.where(flip, 1.0 - b, b)

    prof = Profiler()
    ber, _ = sim_ber(mc_fun, [0.0, 2.0], batch_size=64, max_mc_iter=4,
                     verbose=False, early_stop=False, profiler=prof)
    assert "compile" in prof.times
    assert prof.counts.get("mc_chunk", 0) >= 1
    assert np.all(np.asarray(ber) > 0)
