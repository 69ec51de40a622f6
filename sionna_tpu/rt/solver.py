"""Path solver: shoot-and-bounce candidate discovery plus exact
image-method refinement (API parity with sionna.rt.PathSolver /
Paths, see SURVEY.md 2.12; fresh TPU-first implementation).

Design for TPU/XLA:
- Ray-triangle intersection is dense batched Moller-Trumbore over
  [num_rays, num_triangles] — pure VPU math with static shapes, no
  pointer-chasing BVH needed for the scene sizes handled on-device;
  the candidate-sequence dedupe runs host-side between two jitted
  stages.
- The image method evaluates all (sequence, rx) combinations as one
  batched computation: mirror cascades, plane intersections, occlusion
  checks, and polarized Fresnel field transfer are all elementwise /
  small-matmul ops that XLA fuses.

Module layout (round-3 split of the former 1,600-line monolith):
- geometry.py   ray/triangle primitives, tracing, dedupe, jit cache
- em.py         Fresnel / slab / through-blocker transmission algebra
- field.py      antenna/Doppler/array combination stage
- diffraction.py wedge extraction + UTD coefficients + evaluator
- scattering.py  surface sampling + diffuse evaluator
- paths.py      the Paths container
This file keeps candidate discovery, the specular image-method
evaluator, and orchestration.
"""

import hashlib

import jax
import numpy as np

import jax.numpy as jnp

from ..phy.constants import PI, SPEED_OF_LIGHT
from .accel import build_accel
from .diffraction import extract_wedges, eval_diffraction
from .em import (slab_transmission, transmission_product,
                 transmission_jones_product,
                 fresnel_coefficients)
from .field import combine_paths
from .geometry import (EPS as _EPS, normalize as _normalize,
                       host_real_dtype, host_int_dtype, run_jitted,
                       phase_exp, moller_trumbore, nearest_hit,
                       any_blocking_hit, tri_normals, trace,
                       TRACE_JIT, TRACE_UNIQUE_JIT, fibonacci_sphere,
                       rot_matrix, unit_to_angles, sph_basis,
                       in_triangle)
from .paths import Paths
from .scattering import sample_scatter_points, eval_scattering

__all__ = ["PathSolver", "Paths"]

# Backward-compatible aliases (pre-split private names; tests and
# sibling modules import several of these from here)
_slab_transmission = slab_transmission
_tri_normals = tri_normals
_trace = trace
_host_real_dtype = host_real_dtype
_host_int_dtype = host_int_dtype
_rot_matrix = rot_matrix
_unit_to_angles = unit_to_angles
_sph_basis = sph_basis
_phase_exp = phase_exp
_fibonacci_sphere = fibonacci_sphere
_run_jitted = run_jitted
_in_triangle = in_triangle
_TRACE_JIT = TRACE_JIT
_TRACE_UNIQUE_JIT = TRACE_UNIQUE_JIT

# Scenes with at least this many triangles get the clustered
# acceleration structure (native C++ build + dense cluster culling,
# see accel.py); smaller scenes stay on the plain dense sweep whose
# fixed overhead is lower.
ACCEL_MIN_TRIS = 2048

# Pair count above which the gain output path compacts valid
# (sequence, tx, rx) pairs before the EM tail (see _eval_sequences).
GAIN_COMPACT_MIN_PAIRS = 65536


def _uniform_devices(devs):
    """True when all devices share orientation and velocity (host
    check at trace time) — radio-map cell receivers always do."""
    o = np.stack([np.asarray(d.orientation) for d in devs])
    v = np.stack([np.asarray(d.velocity) for d in devs])
    return bool(np.all(o == o[:1]) and np.all(v == v[:1]))


# ----------------------------------------------------------------------
# Path solver
# ----------------------------------------------------------------------
class PathSolver:
    """Computes propagation paths between all scene transmitters and
    receivers: LoS, up to ``max_depth`` specular reflections,
    transmission through blocking surfaces (``refraction=True``,
    default, matching the upstream PathSolver — blocked LoS/specular
    segments are attenuated by the ITU-R P.2040 slab coefficient of
    each blocker instead of discarded), and optionally first-order
    UTD wedge diffraction (``diffraction=True``) and single-bounce
    diffuse scattering (``diffuse_reflection=True``, requires
    materials with a nonzero ``scattering_coefficient``).  With
    refraction enabled, diffracted and scattered path segments are
    attenuated through blockers the same way.

    Call: solver(scene, max_depth=3, max_num_paths_per_src=100000,
    samples_per_src=20000, los=True, specular_reflection=True,
    refraction=True, diffraction=False, diffuse_reflection=False,
    diffuse_samples=4096, max_num_wedges=20000, seed=41) -> Paths.
    """

    def __call__(self, scene, max_depth=3,
                 max_num_paths_per_src=100000,
                 samples_per_src=20000, los=True,
                 specular_reflection=True,
                 refraction=True,
                 diffraction=False,
                 diffuse_reflection=False,
                 diffuse_samples=4096,
                 max_num_wedges=20000,
                 seed=41, output="paths"):
        """``output="paths"`` (default) returns the full Paths
        object.  ``output="gain"`` instead reduces each solver stage
        ON DEVICE to the incoherent per-link path gain
        sum_paths |a[rx, 0, tx, 0, p]|^2 and returns a [rx, tx]
        float array — the radio-map hot path, where fetching per-path
        fields for tens of thousands of receivers would move MBs per
        stage through the transfer layer for data that is immediately
        reduced on host."""
        tx_names = list(scene.transmitters)
        rx_names = list(scene.receivers)
        if not tx_names or not rx_names:
            raise ValueError(
                "The scene must contain at least one transmitter and "
                "one receiver")
        txs = [scene.transmitters[n] for n in tx_names]
        rxs = [scene.receivers[n] for n in rx_names]
        if scene.tx_array is None or scene.rx_array is None:
            raise ValueError(
                "scene.tx_array and scene.rx_array must be set")

        rd = host_real_dtype()
        idt = host_int_dtype()
        tri = jnp.asarray(scene.triangles.astype(rd))
        has_geometry = scene.num_triangles > 0
        normals = tri_normals(tri) if has_geometry else None
        # Clustered acceleration structure for large scenes (cached
        # per geometry fingerprint; native C++ builder, see accel.py).
        self._accel = (build_accel(scene.triangles.astype(rd))
                       if scene.num_triangles >= ACCEL_MIN_TRIS
                       else None)

        tx_pos = np.stack([t.position for t in txs]).astype(rd)
        rx_pos = np.stack([r.position for r in rxs]).astype(rd)

        # ------------------------------------------------------------
        # 1) Candidate reflection sequences via shoot-and-bounce
        # ------------------------------------------------------------
        sequences = [np.zeros((1, 0), idt)] if los else []
        if specular_reflection and has_geometry and max_depth > 0:
            dirs = jnp.asarray(
                fibonacci_sphere(samples_per_src).astype(rd))
            # All tx sources traced as one ray batch; the prefix
            # dedupe (lexsort + first-occurrence compaction) runs
            # inside the same jitted program, so one dispatch and one
            # [cap, d]-sized fetch replace the raw [R, depth] hit
            # table + host np.unique of round 1.
            num_t = tx_pos.shape[0]
            orig = jnp.broadcast_to(
                jnp.asarray(tx_pos)[:, None, :],
                (num_t,) + dirs.shape).reshape(-1, 3)
            dirs_all = jnp.broadcast_to(
                dirs[None], (num_t,) + dirs.shape).reshape(-1, 3)
            cap = int(min(max_num_paths_per_src,
                          num_t * samples_per_src))
            uniq_dev, counts_dev = TRACE_UNIQUE_JIT(
                tri, normals, orig, dirs_all, max_depth, cap,
                self._accel)
            counts = np.asarray(counts_dev)
            # shortest depths first, capped at max_num_paths_per_src
            budget = max_num_paths_per_src
            for d in range(1, max_depth + 1):
                if budget <= 0:
                    break
                n = int(min(counts[d - 1], budget))
                if n == 0:
                    continue
                uniq = np.asarray(uniq_dev[d - 1])[:n]
                budget -= n
                sequences.append(np.ascontiguousarray(uniq, idt))

        # ------------------------------------------------------------
        # 2) Image-method evaluation of every candidate
        # ------------------------------------------------------------
        freq = scene.frequency
        eta_tri = np.array(
            [m.complex_relative_permittivity(freq)
             for m in scene.triangle_materials]
            if has_geometry else [1. + 0j], np.complex64)
        scat_tri = np.array(
            [m.scattering_coefficient
             for m in scene.triangle_materials]
            if has_geometry else [0.], rd)
        th_tri = np.array(
            [m.thickness for m in scene.triangle_materials]
            if has_geometry else [0.], np.float32)
        tx_j = jnp.asarray(tx_pos)
        rx_j = jnp.asarray(rx_pos)
        # eta/scat stay host NumPy, captured as trace-time constants:
        # complex arrays cannot be device_put through the TPU
        # transfer layer (only baked into compiled programs)
        eta_j = eta_tri
        scat_j = jnp.asarray(scat_tri)
        th_j = jnp.asarray(th_tri)

        # Fingerprint everything the jitted stages close over, so
        # repeated solves of an unchanged configuration reuse the
        # compiled executables (see run_jitted).
        fp = hashlib.blake2b(digest_size=16)
        fp.update(scene.triangles.tobytes())
        fp.update(eta_tri.tobytes())
        fp.update(scat_tri.tobytes())
        fp.update(th_tri.tobytes())
        if has_geometry:
            for m in scene.triangle_materials:
                pat = getattr(m, "scattering_pattern", None)
                if pat is not None:
                    fp.update(repr(pat.canonical()).encode())
        fp.update(b"refr1" if refraction else b"refr0")
        # vectorized device metadata (a per-device Python loop costs
        # ~2 us/device — radio maps carry tens of thousands of cell
        # receivers, and this runs per solve)
        dev_orient = np.stack([d.orientation for d in txs + rxs])
        dev_vel = np.stack([d.velocity for d in txs + rxs])
        fp.update(np.ascontiguousarray(dev_orient).tobytes())
        fp.update(np.ascontiguousarray(dev_vel).tobytes())
        n_tx_d = len(txs)
        rx_uniform = bool(
            np.all(dev_orient[n_tx_d:] == dev_orient[n_tx_d:n_tx_d+1])
            and np.all(dev_vel[n_tx_d:] == dev_vel[n_tx_d:n_tx_d+1]))
        for arr in (scene.tx_array, scene.rx_array):
            fp.update(repr((arr.num_rows, arr.num_cols,
                            arr.vertical_spacing,
                            arr.horizontal_spacing, arr.pattern,
                            arr.polarization)).encode())
        fp.update(repr((scene.frequency, tx_pos.shape,
                        rx_pos.shape,
                        self._accel is not None)).encode())
        base_key = fp.hexdigest()
        gain_mode = output == "gain"

        def _maybe_reduce(fn):
            """In gain mode, reduce a stage's output ON DEVICE to the
            incoherent per-link gain (element (0, 0) of the antenna
            pair, matching the radio map's host math)."""
            if not gain_mode:
                return fn

            def reduced(*args):
                out = fn(*args)
                a = out["a"]  # [rx, ra, tx, ta, S]
                return {"gain": jnp.sum(
                    jnp.abs(a[:, 0, :, 0, :]) ** 2, axis=-1)}
            return reduced

        results = []
        if sequences:
            # ALL depth groups evaluate inside ONE jitted program
            # (sequences stay host NumPy: index constants embedded at
            # trace time — zero-size LoS arrays cannot be transferred
            # to the TPU at all).  One dispatch + one packed fetch
            # replaces one of each per depth: through the tunnel
            # every stage costs ~50 ms in RPC turnaround alone.
            skey = (base_key, "spec", output, tuple(
                hashlib.blake2b(s.tobytes(), digest_size=8)
                .hexdigest() for s in sequences))

            def all_spec(tp, rp):
                outs = {}
                for i, seq in enumerate(sequences):
                    o = self._eval_sequences(
                        scene, tri, normals, seq, tp, rp,
                        eta_j, scat_j, txs, rxs, th_tri=th_j,
                        refraction=refraction,
                        dense_links=gain_mode,
                        output_gain=gain_mode,
                        rx_uniform=rx_uniform)
                    for k, v in o.items():
                        outs[f"{k}__{i}"] = v
                return outs

            combined = run_jitted(skey, all_spec, tx_j, rx_j)
            per_idx = {}
            for k, v in combined.items():
                name, idx = k.rsplit("__", 1)
                per_idx.setdefault(int(idx), {})[name] = v
            for i, seq in enumerate(sequences):
                out = per_idx[i]
                if not gain_mode:
                    out["interactions"] = np.asarray(seq)
                results.append(out)

        # ------------------------------------------------------------
        # 2b) First-order UTD wedge diffraction
        # ------------------------------------------------------------
        if diffraction and has_geometry:
            wedges = extract_wedges(np.asarray(scene.triangles))
            num_w = wedges["origin"].shape[0]
            if num_w > max_num_wedges:
                # keep the wedges nearest the device centroid
                mid = (tx_pos.mean(axis=0) + rx_pos.mean(axis=0)) / 2.
                mids = wedges["origin"] + 0.5 * wedges["length"][
                    :, None] * wedges["e_hat"]
                keep = np.argsort(
                    np.linalg.norm(mids - mid, axis=1))[
                        :max_num_wedges]
                wedges = {k: v[keep] for k, v in wedges.items()}
                num_w = max_num_wedges
            if num_w > 0:
                wedges = {k: (v.astype(rd) if v.dtype.kind == "f"
                              else v.astype(np.int32))
                          for k, v in wedges.items()}
                out = run_jitted(
                    (base_key, "diffr", output, num_w),
                    _maybe_reduce(
                        lambda tp, rp:
                        eval_diffraction(scene, tri, wedges, tp, rp,
                                         eta_j, txs, rxs,
                                         th_tri=th_j,
                                         refraction=refraction,
                                         accel=self._accel)),
                    tx_j, rx_j)
                if not gain_mode:
                    out["interactions"] = \
                        wedges["tri_0"][:, None].astype(np.int64)
                    out["kind"] = 1
                results.append(out)

        # ------------------------------------------------------------
        # 2c) Diffuse (rough-surface) scattering, single bounce
        # ------------------------------------------------------------
        if diffuse_reflection and has_geometry \
                and np.any(scat_tri > 0.):
            sample = sample_scatter_points(scene, scat_tri,
                                           diffuse_samples, seed, rd)
            if sample is not None:
                p_np, tri_idx, d_area = sample
                out = run_jitted(
                    (base_key, "scat", output, diffuse_samples,
                     seed),
                    _maybe_reduce(
                        lambda tp, rp:
                        eval_scattering(
                            scene, tri, normals, tp, rp, eta_j,
                            jnp.asarray(p_np), tri_idx, d_area,
                            diffuse_samples, seed, txs, rxs,
                            th_tri=th_j, refraction=refraction,
                            accel=self._accel)),
                    tx_j, rx_j)
                if not gain_mode:
                    out["interactions"] = \
                        tri_idx[:, None].astype(np.int64)
                    out["kind"] = 2
                results.append(out)

        if gain_mode:
            # [rx, tx] incoherent path gain.  The post-hoc
            # _deduplicate pass is skipped: it only removes the
            # measure-zero case of a specular point landing exactly
            # on an edge shared by two coplanar triangles (counted
            # once per triangle), which perturbs a single map cell by
            # at most 3 dB on that one path — irrelevant against the
            # MB-per-stage fetch it would require.  (Also noted in
            # the RadioMapSolver docstring.)
            if not results:
                # every stage disabled or empty: zero gain, correct
                # shape (np.sum([]) would be a scalar 0.0 and break
                # the radio map's reshape)
                return np.zeros((len(rxs), len(txs)), np.float32)
            return np.sum([r["gain"] for r in results], axis=0)

        # Concatenate over path dim (host: results are NumPy)
        def cat(field):
            return np.concatenate([r[field] for r in results],
                                  axis=-1)

        a = np.concatenate([r["a"] for r in results], axis=-1)
        # Pad interaction records to a common depth with -1
        inter = [np.asarray(r["interactions"]) for r in results]
        width = max(max((i.shape[1] for i in inter), default=1), 1)
        inter = [np.pad(i, ((0, 0), (0, width - i.shape[1])),
                        constant_values=-1) for i in inter]
        # dedupe namespace: interaction kind (0 specular, 1 diffracted,
        # 2 scattered) * 1000 + bounce depth
        depths = np.concatenate(
            [np.full(r["interactions"].shape[0],
                     1000 * r.get("kind", 0)
                     + r["interactions"].shape[1])
             for r in results])
        # per-path interaction type (upstream InteractionType codes:
        # 0 none/LoS, 1 specular, 2 diffracted, 3 scattered)
        def _type_code(r):
            kind = r.get("kind", 0)
            if kind == 1:
                return 2          # diffracted
            if kind == 2:
                return 3          # scattered
            return 1 if r["interactions"].shape[1] > 0 else 0

        types = np.concatenate(
            [np.full(r["interactions"].shape[0], _type_code(r),
                     np.int32) for r in results])
        paths = Paths(
            a=a,
            tau=cat("tau"), valid=cat("valid"),
            theta_t=cat("theta_t"), phi_t=cat("phi_t"),
            theta_r=cat("theta_r"), phi_r=cat("phi_r"),
            doppler=cat("doppler"),
            interactions=np.concatenate(inter, axis=0),
            types=types)
        self._deduplicate(paths, depths)
        return paths

    def trace_functional(self, scene, max_depth=3,
                         samples_per_src=20000,
                         max_num_paths_per_src=100000, los=True,
                         refraction=False, seed=41):
        """Differentiable functional view of the LoS+specular solver
        (upstream parity: Sionna RT is a differentiable ray tracer;
        SURVEY.md 2.12).

        Candidate path discovery (shoot-and-bounce + prefix dedupe)
        runs once against the CURRENT scene geometry; the returned
        pure function re-evaluates the image-method refinement,
        occlusion, polarized Fresnel cascade and array responses for
        given device positions and per-triangle materials:

        ``fn(tx_pos [num_tx, 3], rx_pos [num_rx, 3],
        eta [num_tri] complex, scat [num_tri]) ->
        (a [rx, rx_ant, tx, tx_ant, P] complex,
        tau [rx, tx, P], valid [rx, tx, P])``

        ``fn`` is jittable and differentiable w.r.t. every argument
        (transmitter/receiver placement, complex relative
        permittivity, scattering coefficient), enabling
        gradient-based scene optimization (coverage shaping, material
        calibration) under ``jax.grad`` on the TPU.  Geometry
        (triangles) and the discovered candidate set are baked:
        gradients hold for perturbations that do not change path
        topology (occlusion/validity masks are booleans with zero
        gradient, as in the upstream solver).  On TPU remember the
        tunnel cannot transfer complex arrays — build ``eta`` inside
        jit (e.g. ``eta_re + 1j * eta_im``).

        Returns ``(fn, (tx_pos, rx_pos, eta, scat))`` with the
        arguments at their current scene values.
        """
        tx_names = list(scene.transmitters)
        rx_names = list(scene.receivers)
        if not tx_names or not rx_names:
            raise ValueError(
                "The scene must contain at least one transmitter and "
                "one receiver")
        txs = [scene.transmitters[n] for n in tx_names]
        rxs = [scene.receivers[n] for n in rx_names]
        if scene.tx_array is None or scene.rx_array is None:
            raise ValueError(
                "scene.tx_array and scene.rx_array must be set")

        rd = host_real_dtype()
        idt = host_int_dtype()
        tri = jnp.asarray(scene.triangles.astype(rd))
        has_geometry = scene.num_triangles > 0
        normals = tri_normals(tri) if has_geometry else None
        self._accel = (build_accel(scene.triangles.astype(rd))
                       if scene.num_triangles >= ACCEL_MIN_TRIS
                       else None)
        tx_pos = np.stack([t.position for t in txs]).astype(rd)
        rx_pos = np.stack([r.position for r in rxs]).astype(rd)

        sequences = [np.zeros((1, 0), idt)] if los else []
        if has_geometry and max_depth > 0:
            dirs = jnp.asarray(
                fibonacci_sphere(samples_per_src).astype(rd))
            rows = []
            for t in range(tx_pos.shape[0]):
                orig = jnp.broadcast_to(jnp.asarray(tx_pos[t]),
                                        dirs.shape)
                rows.append(np.asarray(TRACE_JIT(
                    tri, normals, orig, dirs, max_depth,
                    self._accel)))
            ids = np.concatenate(rows, axis=0)
            budget = max_num_paths_per_src
            for d in range(1, max_depth + 1):
                if budget <= 0:
                    break
                pref = ids[:, :d]
                pref = pref[np.all(pref >= 0, axis=1)]
                if pref.shape[0] == 0:
                    continue
                uniq = np.unique(pref, axis=0)[:budget]
                budget -= uniq.shape[0]
                sequences.append(np.ascontiguousarray(uniq, idt))

        freq = scene.frequency
        eta0 = np.array(
            [m.complex_relative_permittivity(freq)
             for m in scene.triangle_materials]
            if has_geometry else [1. + 0j], np.complex64)
        scat0 = np.array(
            [m.scattering_coefficient
             for m in scene.triangle_materials]
            if has_geometry else [0.], rd)
        th0 = np.array(
            [m.thickness for m in scene.triangle_materials]
            if has_geometry else [0.], np.float32)

        def fn(tx_pos, rx_pos, eta, scat, thickness=None):
            # With refraction=True the slab transmission is part of
            # the computation, so gradients also flow through eta and
            # thickness of BLOCKING triangles (material calibration
            # from through-wall measurements).
            th = jnp.asarray(th0) if thickness is None \
                else jnp.asarray(thickness)
            outs = [self._eval_sequences(
                scene, tri, normals, seq, jnp.asarray(tx_pos),
                jnp.asarray(rx_pos), eta, scat, txs, rxs,
                th_tri=th, refraction=refraction)
                for seq in sequences]
            a = jnp.concatenate([o["a"] for o in outs], axis=-1)
            tau = jnp.concatenate([o["tau"] for o in outs], axis=-1)
            valid = jnp.concatenate([o["valid"] for o in outs],
                                    axis=-1)
            return a, tau, valid

        return fn, (jnp.asarray(tx_pos), jnp.asarray(rx_pos),
                    jnp.asarray(eta0), jnp.asarray(scat0))

    @staticmethod
    def _deduplicate(paths, depths):
        """Invalidates duplicate paths per (rx, tx) link.

        A specular point on an edge shared by two coplanar triangles
        yields the same physical path once per triangle; keep one."""
        valid = np.array(paths.valid)
        num_rx, num_tx, num_p = valid.shape
        shape = valid.shape
        keys = np.stack([
            np.broadcast_to(np.arange(num_rx)[:, None, None], shape),
            np.broadcast_to(np.arange(num_tx)[None, :, None], shape),
            np.broadcast_to(np.asarray(depths, np.int64)[None, None],
                            shape),
            np.round(np.asarray(paths.tau) * 1e12).astype(np.int64),
            np.round(np.asarray(paths.theta_t) * 1e6).astype(np.int64),
            np.round(np.asarray(paths.phi_t) * 1e6).astype(np.int64),
        ], axis=-1).reshape(-1, 6)
        flat = valid.reshape(-1)
        cand = np.flatnonzero(flat)
        if cand.size:
            _, first = np.unique(keys[cand], axis=0,
                                 return_index=True)
            keep = np.zeros(flat.shape, bool)
            keep[cand[first]] = True
            flat &= keep
        mask = flat.reshape(shape)
        paths.valid = mask
        paths.a = paths.a * mask.astype(paths.a.dtype)[
            :, None, :, None, :]
        paths.tau = np.where(mask, paths.tau, -1.)

    # ------------------------------------------------------------------
    def _eval_sequences(self, scene, tri, normals, seq, tx_pos,
                        rx_pos, eta_tri, scat_tri, txs, rxs,
                        th_tri=None, refraction=False,
                        dense_links=False, output_gain=False,
                        rx_uniform=None):
        """Evaluates all [S] reflection sequences of equal depth D for
        all TX/RX pairs.  Returns per-path fields with S paths.

        With ``refraction=True`` blocked segments are not discarded:
        each blocking triangle multiplies the path amplitude by its
        ITU-R P.2040 slab transmission coefficient (see
        :func:`em.transmission_product`), matching the upstream
        PathSolver's ``refraction`` interaction."""
        lam = scene.wavelength
        num_tx = tx_pos.shape[0]
        num_rx = rx_pos.shape[0]
        s_count, depth = seq.shape

        # --- Mirror cascade: images of each TX across the sequence
        # planes.  q[k]: [S, num_tx, 3]
        if depth > 0:
            v0 = tri[seq, 0]                           # [S, D, 3]
            n_pl = normals[seq]                        # [S, D, 3]
        images = [jnp.broadcast_to(tx_pos[None], (s_count, num_tx, 3))]
        for k in range(depth):
            q = images[-1]
            d = jnp.sum((q - v0[:, None, k]) * n_pl[:, None, k],
                        axis=-1, keepdims=True)
            images.append(q - 2. * d * n_pl[:, None, k])

        # --- Backward construction of reflection points
        # x[k]: [S, num_tx, num_rx, 3]; x[depth+1] = rx
        x_next = jnp.broadcast_to(rx_pos[None, None],
                                  (s_count, num_tx, num_rx, 3))
        points = [x_next]
        valid = jnp.ones((s_count, num_tx, num_rx), bool)
        for k in range(depth, 0, -1):
            q_k = images[k][:, :, None]                # [S,tx,1,3]
            v0_k = v0[:, None, None, k - 1]
            n_k = n_pl[:, None, None, k - 1]
            seg = x_next - q_k
            denom = jnp.sum(seg * n_k, axis=-1)
            num = jnp.sum((v0_k - q_k) * n_k, axis=-1)
            t_par = jnp.where(jnp.abs(denom) > 1e-12,
                              num / denom, -1.)
            valid &= (t_par > 1e-9) & (t_par < 1. + 1e-9)
            x_k = q_k + t_par[..., None] * seg
            # x_k must lie inside triangle k-1 (barycentric test)
            a_v = tri[seq[:, k - 1], 0][:, None, None]
            b_v = tri[seq[:, k - 1], 1][:, None, None]
            c_v = tri[seq[:, k - 1], 2][:, None, None]
            valid &= in_triangle(x_k, a_v, b_v, c_v)
            points.append(x_k)
            x_next = x_k
        points.append(jnp.broadcast_to(
            tx_pos[None, :, None], (s_count, num_tx, num_rx, 3)))
        # points list is [rx, x_D, ..., x_1, tx] -> reverse
        pts = jnp.stack(points[::-1], axis=0)  # [D+2, S, tx, rx, 3]

        # --- Segment directions and lengths
        segs = pts[1:] - pts[:-1]              # [D+1, S, tx, rx, 3]
        seg_len = jnp.linalg.norm(segs, axis=-1)
        d_hat = segs / jnp.maximum(seg_len[..., None], 1e-30)
        total_len = jnp.sum(seg_len, axis=0)   # [S, tx, rx]
        valid &= total_len > 1e-6

        big_r = s_count * num_tx * num_rx
        # Gain output with valid-pair compaction: for radio maps
        # (every cell a receiver) only the geometrically valid
        # (sequence, cell) pairs — typically 10-30% — need the EM
        # field math above the gain reduction.  Compact them to a
        # static cap, run the tail on [cap, 1, 1], and scatter-add
        # per-cell gains; a scalar cond falls back to the full
        # evaluation if the valid count exceeds the cap.  Gated on a
        # single TX and uniform RX devices so the combine stage can
        # use one representative device.
        if rx_uniform is None:
            rx_uniform = _uniform_devices(rxs)
        if (output_gain and num_tx == 1
                and big_r > GAIN_COMPACT_MIN_PAIRS
                and rx_uniform):
            # Depth-aware cap: each extra reflection constrains the
            # image geometry, so valid fractions fall with depth
            # (measured on the canyon map: 24% at depth 1, 7% at
            # depth 2).  The scalar-cond fallback keeps ANY scene
            # correct if a cap is ever exceeded — only that run's
            # speed degrades.
            frac = 3 if depth <= 1 else 6
            cap = min(big_r, big_r // frac + 8192)
            flat_valid = valid.reshape(-1)
            dest = jnp.cumsum(flat_valid.astype(jnp.int32)) - 1
            count = dest[-1] + 1
            slot = jnp.where(flat_valid, dest, cap)
            sel = jnp.zeros((cap,), jnp.int32).at[slot].set(
                jnp.arange(big_r, dtype=jnp.int32), mode="drop")
            r_id = sel % num_rx
            s_id = sel // (num_rx * num_tx)

            def compact_branch(_):
                pts_c = pts.reshape(depth + 2, big_r, 3)[
                    :, sel][:, :, None, None, :]
                segs_c = segs.reshape(depth + 1, big_r, 3)[
                    :, sel][:, :, None, None, :]
                d_hat_c = d_hat.reshape(depth + 1, big_r, 3)[
                    :, sel][:, :, None, None, :]
                tot_c = total_len.reshape(big_r)[sel][:, None, None]
                seq_c = jnp.asarray(seq)[s_id]
                n_pl_c = n_pl[s_id] if depth > 0 else None
                valid_c = jnp.ones((cap, 1, 1), bool)
                out = self._eval_tail(
                    scene, tri, seq_c, n_pl_c, pts_c, segs_c,
                    d_hat_c, tot_c, valid_c, eta_tri, scat_tri,
                    th_tri, refraction, [txs[0]], [rxs[0]],
                    compact_transmission=False)
                a = out["a"]                 # [1, ra, 1, ta, cap]
                g = jnp.abs(a[0, 0, 0, 0, :]) ** 2
                g = jnp.where(jnp.arange(cap) < count, g, 0.)
                return jnp.zeros((num_rx, num_tx), g.dtype).at[
                    r_id, 0].add(g)

            def full_branch(_):
                out = self._eval_tail(
                    scene, tri, seq, n_pl if depth > 0 else None,
                    pts, segs, d_hat, total_len, valid, eta_tri,
                    scat_tri, th_tri, refraction, txs, rxs,
                    dense_links=dense_links)
                a = out["a"]
                return jnp.sum(jnp.abs(a[:, 0, :, 0, :]) ** 2,
                               axis=-1)

            gain = jax.lax.cond(count > cap, full_branch,
                                compact_branch, None)
            return {"gain": gain}

        n_pl_arg = n_pl if depth > 0 else None
        out = self._eval_tail(scene, tri, seq, n_pl_arg, pts, segs,
                              d_hat, total_len, valid, eta_tri,
                              scat_tri, th_tri, refraction, txs, rxs,
                              dense_links=dense_links)
        if output_gain:
            a = out["a"]
            return {"gain": jnp.sum(jnp.abs(a[:, 0, :, 0, :]) ** 2,
                                    axis=-1)}
        return out

    # ------------------------------------------------------------------
    def _eval_tail(self, scene, tri, seq, n_pl, pts, segs, d_hat,
                   total_len, valid, eta_tri, scat_tri, th_tri,
                   refraction, txs, rxs, dense_links=False,
                   compact_transmission=True):
        """EM field transfer for geometrically valid specular paths:
        per-segment transverse bases, Fresnel reflection matrices,
        through-blocker transmission, the Jones cascade, and the
        antenna/Doppler combine.  Shapes carry a generic
        [S, num_tx, num_rx] leading layout — the gain path calls this
        on compacted valid pairs reshaped to [cap, 1, 1]."""
        lam = scene.wavelength
        s_count = pts.shape[1]
        num_tx = pts.shape[2]
        num_rx = pts.shape[3]
        depth = pts.shape[0] - 2
        if not isinstance(seq, np.ndarray):
            # compacted path: seq is traced, so material lookups must
            # be device gathers of embedded constants rather than
            # host fancy-indexing
            eta_tri = jnp.asarray(eta_tri)
        # --- Per-segment transverse bases and reflection matrices.
        # seg_basis[k] = (e_a, e_b) frame the field is expressed in
        # while traveling segment k; each reflection rotates into the
        # next frame.  Bases are needed BEFORE the occlusion loop so
        # through-blocker transmission can be applied as a full
        # polarimetric 2x2 Jones factor in the segment's own frame.
        e_a, e_b = sph_basis(d_hat[0])        # [S,tx,rx,3] each
        seg_basis = [(e_a, e_b)]
        refl_rot = []
        for k in range(depth):
            d_in = d_hat[k]
            d_out = d_hat[k + 1]
            n_k = n_pl[:, None, None, k]
            n_k = jnp.where(
                jnp.sum(n_k * d_in, axis=-1, keepdims=True) > 0,
                -n_k, n_k)
            cos_i = jnp.clip(-jnp.sum(d_in * n_k, axis=-1),
                             0., 1.).astype(jnp.float32)
            # s (TE) axis; fall back to e_a at normal incidence
            e_s = jnp.cross(d_in, n_k)
            s_norm = jnp.linalg.norm(e_s, axis=-1, keepdims=True)
            e_s = jnp.where(s_norm > 1e-6, e_s / jnp.maximum(
                s_norm, 1e-30), e_a)
            e_p_in = jnp.cross(e_s, d_in)
            e_p_out = jnp.cross(e_s, d_out)
            # Fresnel coefficients (shared algebra in em.py)
            eta = eta_tri[seq[:, k]][:, None, None]
            r_s, r_p = fresnel_coefficients(cos_i, eta)
            s_coef = jnp.sqrt(jnp.maximum(
                1. - scat_tri[seq[:, k]][:, None, None] ** 2, 0.)
            ).astype(jnp.float32)
            r_s = r_s * s_coef
            r_p = r_p * s_coef
            # Basis rotation into (e_s, e_p_in)
            rot = jnp.stack(
                [jnp.stack([jnp.sum(e_s * e_a, -1),
                            jnp.sum(e_s * e_b, -1)], -1),
                 jnp.stack([jnp.sum(e_p_in * e_a, -1),
                            jnp.sum(e_p_in * e_b, -1)], -1)],
                axis=-2).astype(jnp.complex64)
            refl = jnp.zeros(rot.shape, jnp.complex64)
            refl = refl.at[..., 0, 0].set(r_s.astype(jnp.complex64))
            refl = refl.at[..., 1, 1].set(r_p.astype(jnp.complex64))
            refl_rot.append((refl, rot))
            e_a, e_b = e_s, e_p_out
            seg_basis.append((e_a, e_b))

        # --- Occlusion: without refraction every segment must be free
        # of intersections (ignoring the reflecting triangles at its
        # endpoints); with refraction each blocker instead applies its
        # per-polarization TE/TM slab coefficients as a 2x2 Jones
        # factor in the segment's frame (em.transmission_jones_product
        # — the upstream PathSolver keeps the same polarimetric
        # cascade through its ``refraction`` interaction)
        jones_t = [None] * (depth + 1)
        if scene.num_triangles > 0:
            big_r = s_count * num_tx * num_rx
            accel = getattr(self, "_accel", None)

            def seg_inputs(k):
                o = pts[k].reshape(-1, 3)
                d = segs[k].reshape(-1, 3)
                excl_ids = None
                if depth > 0:
                    ids = []
                    for kk in (k - 1, k):
                        if 0 <= kk < depth:
                            ids.append(seq[:, kk])
                        else:
                            ids.append(jnp.full((s_count,), -1,
                                                seq.dtype))
                    excl = jnp.stack(ids, axis=1)      # [S, 2]
                    excl_ids = jnp.broadcast_to(
                        excl[:, None, None, :],
                        (s_count, num_tx, num_rx, 2)).reshape(-1, 2)
                return o, d, excl_ids

            if refraction:
                def jones_all(sel=None):
                    """Per-segment transmission Jones factors,
                    optionally on a compacted ray subset."""
                    outs = []
                    for k in range(depth + 1):
                        o, d, excl_ids = seg_inputs(k)
                        ea_k, eb_k = seg_basis[k]
                        shape3 = (s_count, num_tx, num_rx, 3)
                        ea_k = jnp.broadcast_to(
                            ea_k, shape3).reshape(-1, 3)
                        eb_k = jnp.broadcast_to(
                            eb_k, shape3).reshape(-1, 3)
                        if sel is not None:
                            o, d, ea_k, eb_k = (o[sel], d[sel],
                                                ea_k[sel], eb_k[sel])
                            if excl_ids is not None:
                                excl_ids = excl_ids[sel]
                        if accel is not None:
                            from .accel import \
                                transmission_jones_product_accel
                            jt = transmission_jones_product_accel(
                                o, d, accel, eta_tri, th_tri, lam,
                                ea_k, eb_k, excl_ids=excl_ids)
                        else:
                            jt = transmission_jones_product(
                                o, d, tri, eta_tri, th_tri, lam,
                                ea_k, eb_k, excl_ids=excl_ids)
                        outs.append(jt)
                    return tuple(outs)

                # Valid-pair compaction: only geometrically valid
                # (sequence, tx, rx) pairs need the (expensive)
                # through-blocker transmission query — typically a
                # small fraction of the candidate set (most specular
                # images miss their triangle for a given RX).
                # Invalid rays keep an identity factor, which is
                # irrelevant: combine_paths zeroes their field.  A
                # scalar lax.cond falls back to the full query if the
                # valid count ever exceeds the static cap.
                # dense-link workloads (radio maps: every cell a
                # receiver) keep ~10-20% of pairs valid; sparse-link
                # path solves keep well under 1%.
                frac = 4 if dense_links else 64
                floor = 4096 if dense_links else 1024
                cap = min(big_r, big_r // frac + floor)
                if compact_transmission and cap < big_r:
                    flat_valid = valid.reshape(-1)
                    dest = jnp.cumsum(
                        flat_valid.astype(jnp.int32)) - 1
                    count = dest[-1] + 1
                    slot = jnp.where(flat_valid, dest, cap)
                    sel = jnp.zeros((cap,), jnp.int32).at[slot].set(
                        jnp.arange(big_r, dtype=jnp.int32),
                        mode="drop")

                    def compact_branch(_):
                        eye = jnp.broadcast_to(
                            jnp.eye(2, dtype=jnp.complex64),
                            (big_r, 2, 2))
                        return tuple(
                            eye.at[sel].set(jt)
                            for jt in jones_all(sel))

                    jt_list = jax.lax.cond(
                        count > cap, lambda _: jones_all(None),
                        compact_branch, None)
                else:
                    jt_list = jones_all(None)
                jones_t = [jt.reshape(s_count, num_tx, num_rx, 2, 2)
                           for jt in jt_list]
            else:
                for k in range(depth + 1):
                    o, d, excl_ids = seg_inputs(k)
                    blocked = any_blocking_hit(
                        o, d, tri, excl_ids=excl_ids, accel=accel)
                    valid &= ~blocked.reshape(s_count, num_tx,
                                              num_rx)

        # --- Polarized field transfer (Jones matrix cascade):
        # segment-k transmission (in frame k), then reflection k
        jones = jnp.broadcast_to(
            jnp.eye(2, dtype=jnp.complex64),
            (s_count, num_tx, num_rx, 2, 2))
        for k in range(depth + 1):
            if jones_t[k] is not None:
                jones = jones_t[k] @ jones
            if k < depth:
                refl, rot = refl_rot[k]
                jones = refl @ rot @ jones
        e_a, e_b = seg_basis[-1]

        # Project onto the receive spherical basis (arrival direction
        # u_r = -d_hat[-1]; e_theta(-u)=e_theta(u), e_phi(-u)=-e_phi(u))
        u_r = -d_hat[-1]
        e_tr, e_pr = sph_basis(u_r)
        proj = jnp.stack(
            [jnp.stack([jnp.sum(e_tr * e_a, -1),
                        jnp.sum(e_tr * e_b, -1)], -1),
             jnp.stack([jnp.sum(e_pr * e_a, -1),
                        jnp.sum(e_pr * e_b, -1)], -1)],
            axis=-2).astype(jnp.complex64)
        jones = proj @ jones                    # [S,tx,rx,2,2]

        mag = (lam / (4. * PI * jnp.maximum(total_len, 1e-9))
               ).astype(jnp.float32)
        # through-blocker transmission is folded into the Jones
        # cascade (jones_t factors) — amp carries spreading + phase
        amp = mag * phase_exp(total_len, lam)
        tau = total_len / SPEED_OF_LIGHT
        return combine_paths(scene, txs, rxs, d_hat[0], u_r, jones,
                             amp, valid, tau)

