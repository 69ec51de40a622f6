"""Monte-Carlo BER/BLER simulation driver.

TPU-native re-design of the reference's ``sim_ber``
(reference: src/sionna/phy/utils/misc.py:329-860). Architectural
differences, deliberate:

* The reference launches one compiled graph per MC iteration and reads
  stopping counters on the host every iteration. Here, ``device_iters``
  MC iterations are fused into a single on-device ``lax.scan`` with
  integer error accumulators; the host only fetches four scalars per
  chunk. This amortizes launch overhead and keeps the TPU busy.
* Data parallelism: instead of ``tf.distribute.MirroredStrategy``
  (reference misc.py:618-655), pass ``distribute="all"`` or a
  ``jax.sharding.Mesh`` - the batch is sharded over the mesh with
  ``shard_map`` and error counters are reduced with ``psum`` over ICI.
* Randomness: ``mc_fun`` may accept a ``key`` keyword argument; the
  driver then threads a fresh, per-iteration PRNG key through the scan
  (fully reproducible given ``seed``). Without a ``key`` parameter, the
  function must manage its own randomness at trace time.
"""

import inspect
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import config, dtypes
from .misc import hard_decisions

__all__ = ["sim_ber", "init_multihost"]


def _accepts_key(fn):
    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return False
    if "key" in sig.parameters:
        return True
    return any(p.kind == inspect.Parameter.VAR_KEYWORD
               for p in sig.parameters.values())


def _make_chunk_fn(mc_fun, batch_size, device_iters, soft_estimates,
                   pass_key, mesh):
    """Builds a jitted function running ``device_iters`` MC iterations
    on device, returning (bit_errors, block_errors, num_bits,
    num_blocks) as int64 scalars."""

    def one_iter(ebno_db, key):
        if pass_key:
            outs = mc_fun(batch_size, ebno_db, key=key)
        else:
            outs = mc_fun(batch_size, ebno_db)
        b, b_hat = outs
        if soft_estimates:
            b_hat = hard_decisions(b_hat)
        bit_e = jnp.sum((b != b_hat).astype(jnp.int64))
        blk_e = jnp.sum(jnp.any(b != b_hat, axis=-1).astype(jnp.int64))
        nb = jnp.asarray(np.prod(b.shape), jnp.int64)
        nblk = jnp.asarray(np.prod(b.shape[:-1]), jnp.int64)
        return bit_e, blk_e, nb, nblk

    def chunk(ebno_db, key):
        def body(carry, i):
            k = jax.random.fold_in(key, i)
            bit_e, blk_e, nb, nblk = one_iter(ebno_db, k)
            c = (carry[0] + bit_e, carry[1] + blk_e,
                 carry[2] + nb, carry[3] + nblk)
            return c, None
        init = tuple(jnp.zeros((), jnp.int64) for _ in range(4))
        carry, _ = jax.lax.scan(body, init, jnp.arange(device_iters))
        return carry

    if mesh is None:
        return jax.jit(chunk)

    # Shard the batch over all mesh axes: each device runs
    # batch_size / num_devices examples; counters are psum-reduced.
    axis_names = mesh.axis_names
    n_dev = int(np.prod([mesh.shape[a] for a in axis_names]))
    if batch_size % n_dev != 0:
        raise ValueError(
            f"batch_size ({batch_size}) must be divisible by the number "
            f"of devices in the mesh ({n_dev})")
    local_bs = batch_size // n_dev

    def one_iter_local(ebno_db, key):
        # Distinct RNG stream per shard
        idx = jax.lax.axis_index(axis_names[0])
        for a in axis_names[1:]:
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        key = jax.random.fold_in(key, idx)
        if pass_key:
            outs = mc_fun(local_bs, ebno_db, key=key)
        else:
            outs = mc_fun(local_bs, ebno_db)
        b, b_hat = outs
        if soft_estimates:
            b_hat = hard_decisions(b_hat)
        bit_e = jnp.sum((b != b_hat).astype(jnp.int64))
        blk_e = jnp.sum(jnp.any(b != b_hat, axis=-1).astype(jnp.int64))
        nb = jnp.asarray(np.prod(b.shape), jnp.int64)
        nblk = jnp.asarray(np.prod(b.shape[:-1]), jnp.int64)
        return bit_e, blk_e, nb, nblk

    from jax import shard_map

    def sharded_chunk(ebno_db, key):
        def body(carry, i):
            k = jax.random.fold_in(key, i)
            bit_e, blk_e, nb, nblk = one_iter_local(ebno_db, k)
            c = (carry[0] + bit_e, carry[1] + blk_e,
                 carry[2] + nb, carry[3] + nblk)
            return c, None
        init = tuple(jnp.zeros((), jnp.int64) for _ in range(4))
        carry, _ = jax.lax.scan(body, init, jnp.arange(device_iters))
        return tuple(jax.lax.psum(c, axis_names) for c in carry)

    fn = shard_map(sharded_chunk, mesh=mesh,
                   in_specs=(P(), P()), out_specs=(P(), P(), P(), P()),
                   check_vma=False)
    return jax.jit(fn)


def _resolve_mesh(distribute):
    if distribute is None:
        return None
    if isinstance(distribute, Mesh):
        return distribute
    if distribute == "all":
        devs = jax.devices()
        if len(devs) == 1:
            return None
        return Mesh(np.array(devs), ("batch",))
    if distribute == "multihost":
        # DCN multi-host data parallelism (SURVEY build-plan step 11;
        # reference analog misc.py:618-655): same psum chunk, mesh
        # over the GLOBAL device set. The caller must have run
        # init_multihost()/jax.distributed.initialize() at process
        # start (before first backend use).
        if jax.process_count() < 2:
            raise RuntimeError(
                "distribute='multihost' requires an initialized "
                "multi-process runtime: call "
                "sionna_tpu.phy.utils.init_multihost(...) (or "
                "jax.distributed.initialize) before any JAX "
                "computation, and launch one process per host")
        return Mesh(np.array(jax.devices()), ("batch",))
    if isinstance(distribute, (list, tuple)):
        return Mesh(np.array(list(distribute)), ("batch",))
    raise ValueError(f"Unsupported distribute argument: {distribute}")


def init_multihost(coordinator_address=None, num_processes=None,
                   process_id=None, **kwargs):
    """Initializes the JAX multi-process (DCN) runtime for
    ``sim_ber(distribute='multihost')``.

    Thin wrapper over ``jax.distributed.initialize`` (args may also
    come from the cluster environment, e.g. on Cloud TPU pods where
    all three can be None). Must run before any other JAX call in the
    process. Every process then sees the global device set via
    ``jax.devices()`` and the sweep's error counters are psum-reduced
    over DCN+ICI; all processes must run the same sweep (same seed).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id, **kwargs)


def sim_ber(mc_fun, ebno_dbs, batch_size, max_mc_iter,
            soft_estimates=False,
            num_target_bit_errors=None,
            num_target_block_errors=None,
            target_ber=None,
            target_bler=None,
            early_stop=True,
            graph_mode=None,           # accepted for API parity; always jit
            distribute=None,
            device_iters=None,
            verbose=True,
            forward_keyboard_interrupt=True,
            callback=None,
            checkpoint_path=None,
            precision=None,
            profiler=None):
    """Simulates until target errors or ``max_mc_iter`` per SNR point.

    Returns ``(ber, bler)`` arrays of the same length as ``ebno_dbs``.
    Points skipped due to early stopping are set to ``nan`` (BER) /
    ``nan`` (BLER), and interrupted points to ``-1`` like the reference.

    ``checkpoint_path``: optional ``.npz`` path; error counters are
    persisted after every chunk so an interrupted sweep resumes where
    it stopped (completed points are skipped, partial points continue
    from their recorded iteration count).

    ``profiler``: optional :class:`~sionna_tpu.phy.utils.Profiler`;
    records per-phase wall times ("compile" for first-trace chunk
    calls, "mc_chunk" for steady-state device execution) and emits
    xprof trace annotations when the profiler captures a trace.
    """
    # pylint: disable=unused-argument
    if graph_mode not in (None, "graph", "xla"):
        raise ValueError(
            "graph_mode must be None, 'graph' or 'xla' (all modes jit "
            "on TPU; the kwarg exists for reference API parity)")
    if precision not in (None, "single", "double"):
        raise ValueError("precision must be 'single' or 'double'")
    ebno_dbs = np.atleast_1d(np.asarray(ebno_dbs, np.float64))
    num_points = len(ebno_dbs)

    mesh = _resolve_mesh(distribute)
    pass_key = _accepts_key(mc_fun)

    if device_iters is None:
        # Fuse enough iterations to amortize launch overhead but still
        # poll stopping conditions reasonably often.
        device_iters = int(min(max(1, max_mc_iter // 10), 32))
    device_iters = int(min(device_iters, max_mc_iter))

    chunk_fns = {}

    def get_chunk_fn(n_iters):
        if n_iters not in chunk_fns:
            chunk_fns[n_iters] = _make_chunk_fn(
                mc_fun, batch_size, n_iters, soft_estimates, pass_key, mesh)
        return chunk_fns[n_iters]

    bit_errors = np.zeros(num_points, np.int64)
    block_errors = np.zeros(num_points, np.int64)
    nb_bits = np.zeros(num_points, np.int64)
    nb_blocks = np.zeros(num_points, np.int64)
    runtimes = np.zeros(num_points, np.float64)
    status = [""] * num_points
    iters_state = np.zeros(num_points, np.int64)

    if checkpoint_path is not None and os.path.isfile(checkpoint_path):
        try:
            ckpt = np.load(checkpoint_path, allow_pickle=True)
            ckpt["ebno_dbs"]
        except Exception:
            ckpt = None
            if verbose:
                print(f"Checkpoint {checkpoint_path} is unreadable; "
                      "starting fresh")
        if ckpt is not None and (len(ckpt["ebno_dbs"]) == num_points
                and np.allclose(ckpt["ebno_dbs"], ebno_dbs)):
            bit_errors = ckpt["bit_errors"].astype(np.int64)
            block_errors = ckpt["block_errors"].astype(np.int64)
            nb_bits = ckpt["nb_bits"].astype(np.int64)
            nb_blocks = ckpt["nb_blocks"].astype(np.int64)
            iters_state = ckpt["iters"].astype(np.int64)
            status = list(ckpt["status"])
            if verbose:
                print(f"Resuming sweep from {checkpoint_path}")
        elif ckpt is not None and verbose:
            print(f"Checkpoint {checkpoint_path} does not match this "
                  "sweep; starting fresh")

    def _save_checkpoint():
        if checkpoint_path is None or jax.process_index() != 0:
            return
        tmp = checkpoint_path + ".tmp.npz"
        np.savez(tmp, ebno_dbs=ebno_dbs, bit_errors=bit_errors,
                 block_errors=block_errors, nb_bits=nb_bits,
                 nb_blocks=nb_blocks, iters=iters_state,
                 status=np.asarray(status, object))
        os.replace(tmp, checkpoint_path)

    if verbose:
        print(f"EbNo [dB] |       BER |      BLER |  bit errors |"
              f"    num bits | block errors |  num blocks | runtime [s] |"
              f"    status")
        print("-" * 126)

    root_key = config.next_key()
    stop_sweep = False
    interrupted = False
    _compiled = set()   # chunk-length keys that have been traced

    try:
        for i in range(num_points):
            if status[i] not in ("", "interrupted"):
                continue  # already completed (resumed sweep)
            if stop_sweep:
                status[i] = "not simulated"
                continue
            t0 = time.perf_counter()
            iters_done = int(iters_state[i])
            status[i] = ""
            point_done = False
            while iters_done < max_mc_iter and not point_done:
                n = min(device_iters, max_mc_iter - iters_done)
                fn = get_chunk_fn(n)
                # fold point index and iteration separately so no two
                # (point, iteration) pairs can collide
                key = jax.random.fold_in(
                    jax.random.fold_in(root_key, i), iters_done)
                if profiler is not None:
                    name = "mc_chunk" if n in _compiled else "compile"
                    _compiled.add(n)
                    with profiler.phase(name):
                        be, ble, nb, nblk = jax.block_until_ready(
                            fn(jnp.asarray(ebno_dbs[i], jnp.float32),
                               key))
                else:
                    be, ble, nb, nblk = fn(
                        jnp.asarray(ebno_dbs[i], jnp.float32), key)
                bit_errors[i] += int(be)
                block_errors[i] += int(ble)
                nb_bits[i] += int(nb)
                nb_blocks[i] += int(nblk)
                iters_done += n
                iters_state[i] = iters_done
                _save_checkpoint()

                if (num_target_bit_errors is not None
                        and bit_errors[i] >= num_target_bit_errors):
                    status[i] = "reached target bit errors"
                    point_done = True
                if (num_target_block_errors is not None
                        and block_errors[i] >= num_target_block_errors):
                    status[i] = "reached target block errors"
                    point_done = True
                if callback is not None:
                    cb_ret = callback(iters_done, i, ebno_dbs, bit_errors,
                                      block_errors, nb_bits, nb_blocks)
                    if cb_ret is True:
                        status[i] = "callback stop"
                        point_done = True
            if not status[i]:
                status[i] = "reached max iter"
            runtimes[i] = time.perf_counter() - t0
            _save_checkpoint()

            ber_i = bit_errors[i] / max(nb_bits[i], 1)
            bler_i = block_errors[i] / max(nb_blocks[i], 1)
            if verbose:
                print(f"{ebno_dbs[i]:9.3f} | {ber_i:9.3e} | {bler_i:9.3e} |"
                      f" {bit_errors[i]:11d} | {nb_bits[i]:11d} |"
                      f" {block_errors[i]:12d} | {nb_blocks[i]:11d} |"
                      f" {runtimes[i]:11.2f} | {status[i]}")

            # Sweep-level early stopping (monotonic SNR assumption)
            if early_stop and block_errors[i] == 0:
                stop_sweep = True
                if verbose:
                    print(f"\nSimulation stopped as no error occurred "
                          f"@ EbNo = {ebno_dbs[i]:.1f} dB.\n")
            if target_ber is not None and ber_i < target_ber:
                stop_sweep = True
            if target_bler is not None and bler_i < target_bler:
                stop_sweep = True
    except KeyboardInterrupt as e:
        interrupted = True
        for j in range(num_points):
            if status[j] == "":
                status[j] = "interrupted"
        _save_checkpoint()
        if forward_keyboard_interrupt:
            raise e

    ber = np.where(nb_bits > 0, bit_errors / np.maximum(nb_bits, 1),
                   np.nan)
    bler = np.where(nb_blocks > 0,
                    block_errors / np.maximum(nb_blocks, 1), np.nan)
    if interrupted:
        ber = np.where(nb_bits > 0, ber, -1.0)
        bler = np.where(nb_blocks > 0, bler, -1.0)
    return jnp.asarray(ber, dtypes["double"]["jax"]["rdtype"]), \
        jnp.asarray(bler, dtypes["double"]["jax"]["rdtype"])
