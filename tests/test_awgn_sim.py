"""End-to-end slice: uncoded QAM over AWGN vs closed-form BER, plus
sim_ber driver behavior (single device and 8-device CPU mesh)."""

import numpy as np
import pytest
from scipy.special import erfc

import jax
import jax.numpy as jnp

from sionna_tpu.phy import AWGN, BinarySource, Mapper, Demapper
from sionna_tpu.phy.utils import ebnodb2no, sim_ber, hard_decisions


def make_model(num_bits_per_symbol):
    binary_source = BinarySource()
    mapper = Mapper("qam", num_bits_per_symbol)
    demapper = Demapper("app", "qam", num_bits_per_symbol)
    awgn = AWGN()

    def mc_fun(batch_size, ebno_db, key=None):
        k1, k2 = jax.random.split(key)
        no = ebnodb2no(ebno_db, num_bits_per_symbol, 1.0)
        b = binary_source([batch_size, 1024], key=k1)
        x = mapper(b)
        y = awgn(x, no, key=k2)
        llr = demapper(y, no)
        return b, hard_decisions(llr)

    return mc_fun


def qpsk_ber_theory(ebno_db):
    ebno = 10 ** (ebno_db / 10)
    return 0.5 * erfc(np.sqrt(ebno))


def test_qpsk_awgn_ber_matches_theory():
    mc_fun = make_model(2)
    ebno_dbs = np.array([0.0, 2.0, 4.0])
    ber, bler = sim_ber(mc_fun, ebno_dbs, batch_size=256, max_mc_iter=8,
                        early_stop=False, verbose=False)
    ber = np.asarray(ber)
    theory = qpsk_ber_theory(ebno_dbs)
    np.testing.assert_allclose(ber, theory, rtol=0.15)


def test_16qam_awgn_ber():
    # 16-QAM approximate BER (Gray): 3/8 * erfc(sqrt(2/5 * Eb/No *4 /2))
    mc_fun = make_model(4)
    ebno_dbs = np.array([4.0])
    ber, _ = sim_ber(mc_fun, ebno_dbs, batch_size=512, max_mc_iter=8,
                     early_stop=False, verbose=False)
    ebno = 10 ** (4.0 / 10)
    theory = 3 / 8 * erfc(np.sqrt(4 * ebno / 10))
    assert float(ber[0]) == pytest.approx(theory, rel=0.2)


def test_sim_ber_early_stop():
    mc_fun = make_model(2)
    # Very high SNR: no errors -> sweep stops, later points not simulated
    ebno_dbs = np.array([20.0, 21.0, 22.0])
    ber, bler = sim_ber(mc_fun, ebno_dbs, batch_size=64, max_mc_iter=2,
                        early_stop=True, verbose=False)
    assert np.isnan(np.asarray(ber)[1])


def test_sim_ber_target_block_errors():
    mc_fun = make_model(2)
    ber, bler = sim_ber(mc_fun, np.array([0.0]), batch_size=64,
                        max_mc_iter=100, num_target_block_errors=10,
                        device_iters=1, verbose=False)
    assert np.asarray(ber)[0] > 0


def test_sim_ber_distributed_mesh():
    # 8 virtual CPU devices: batch sharded, psum-reduced counters
    assert len(jax.devices()) == 8
    mc_fun = make_model(2)
    ebno_dbs = np.array([2.0])
    ber, _ = sim_ber(mc_fun, ebno_dbs, batch_size=256, max_mc_iter=8,
                     early_stop=False, verbose=False, distribute="all")
    theory = qpsk_ber_theory(2.0)
    assert float(ber[0]) == pytest.approx(theory, rel=0.2)


def test_sim_ber_without_key_param():
    # mc_fun that manages its own randomness (traced once -> same batch
    # each iter, but must still run)
    binary_source = BinarySource()
    mapper = Mapper("qam", 2)
    demapper = Demapper("app", "qam", 2, hard_out=True)
    awgn = AWGN()

    def mc_fun(batch_size, ebno_db):
        no = ebnodb2no(ebno_db, 2, 1.0)
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        b = binary_source([batch_size, 64], key=k1)
        y = awgn(mapper(b), no, key=k2)
        return b, demapper(y, no)

    ber, _ = sim_ber(mc_fun, [0.0], batch_size=32, max_mc_iter=2,
                     verbose=False, early_stop=False)
    assert np.isfinite(float(ber[0]))


def test_jit_vmap_grad_compose():
    # The full TX->channel->RX chain composes with jit and grad
    mapper = Mapper("qam", 4)
    demapper = Demapper("app", "qam", 4)

    @jax.jit
    def chain(b, no, key):
        x = mapper(b)
        y = AWGN()(x, no, key=key)
        return demapper(y, no)

    b = BinarySource()([8, 64])
    llr = chain(b, 0.1, jax.random.PRNGKey(0))
    assert llr.shape == (8, 64)

    def loss(no):
        y = mapper(b)
        return jnp.mean(demapper(y, no) ** 2)

    g = jax.grad(loss)(0.5)
    assert np.isfinite(float(g))


def test_sim_ber_checkpoint_resume(tmp_path):
    """Sweeps persist counters and resume partial points."""
    import os
    from sionna_tpu.phy.utils import sim_ber, ebnodb2no
    from sionna_tpu.phy import BinarySource, Mapper, Demapper, AWGN

    src, mp = BinarySource(), Mapper("qam", 2)
    dm, ch = Demapper("app", "qam", 2), AWGN()

    def run(batch_size, ebno_db, key=None):
        k1, k2 = jax.random.split(key)
        b = src([batch_size, 100], key=k1)
        no = ebnodb2no(ebno_db, 2, 1.)
        llr = dm(ch(mp(b), no, key=k2), no)
        return b, (llr > 0).astype(b.dtype)

    ck = str(tmp_path / "sweep.npz")
    ber1, _ = sim_ber(run, [0., 3.], 100, max_mc_iter=4,
                      early_stop=False, verbose=False,
                      checkpoint_path=ck)
    assert os.path.isfile(ck)
    st = np.load(ck, allow_pickle=True)
    assert list(st["status"]) == ["reached max iter"] * 2
    # mark point 1 half-done and resume
    status = st["status"].copy()
    status[1] = ""
    iters = st["iters"].copy()
    iters[1] = 2
    np.savez(ck, ebno_dbs=st["ebno_dbs"],
             bit_errors=st["bit_errors"],
             block_errors=st["block_errors"], nb_bits=st["nb_bits"],
             nb_blocks=st["nb_blocks"], iters=iters, status=status)
    ber2, _ = sim_ber(run, [0., 3.], 100, max_mc_iter=4,
                      early_stop=False, verbose=False,
                      checkpoint_path=ck)
    st2 = np.load(ck, allow_pickle=True)
    assert list(st2["iters"]) == [4, 4]
    assert np.isfinite(np.asarray(ber2)).all()


def test_trainable_constellation_learning():
    """End-to-end learning (reference
    test/integration/test_rx_tx_learning.py pattern): optimize
    constellation points against the demapper BCE through an AWGN
    channel with optax; evaluated on a held-out batch, the loss must
    decrease and the geometry must actually move."""
    import optax
    from sionna_tpu.phy import BinarySource, Mapper, Demapper, AWGN
    from sionna_tpu.phy.mapping import Constellation
    from sionna_tpu.phy.utils import ebnodb2no

    nbps = 4
    const = Constellation("qam", nbps)
    points0 = jnp.asarray(const.points)
    src_blk, awgn = BinarySource(), AWGN()
    mapper = Mapper(constellation=const)
    demapper = Demapper("app", constellation=const)
    no = ebnodb2no(5.0, nbps, 1.0)

    def loss_fn(points, key):
        k1, k2 = jax.random.split(key)
        b = src_blk([512, 256], key=k1)
        # unit average energy, like the trainable reference
        pts = points / jnp.sqrt(jnp.mean(jnp.abs(points) ** 2))
        y = awgn(mapper(b, points=pts), no, key=k2)
        llr = demapper(y, no, points=pts)
        return jnp.mean(jnp.log1p(jnp.exp(-(2 * b - 1) * llr)))

    eval_key = jax.random.PRNGKey(1234)
    eval_loss = jax.jit(lambda p: loss_fn(p, eval_key))
    vg = jax.jit(jax.value_and_grad(loss_fn))

    opt = optax.adam(2e-2)
    state = opt.init(points0)
    points = points0
    loss_before = float(eval_loss(points0))
    for i in range(60):
        _, g = vg(points, jax.random.fold_in(jax.random.PRNGKey(5), i))
        # complex parameters: descend along the conjugate gradient
        updates, state = opt.update(jnp.conj(g), state)
        points = optax.apply_updates(points, updates)
    loss_after = float(eval_loss(points))
    assert loss_after < loss_before - 1e-4, (loss_before, loss_after)
    assert float(jnp.max(jnp.abs(points - points0))) > 1e-3
