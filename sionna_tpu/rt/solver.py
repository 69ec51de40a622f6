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
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..phy.constants import PI, SPEED_OF_LIGHT

__all__ = ["PathSolver", "Paths"]

_EPS = 1e-5


# ----------------------------------------------------------------------
# Geometry primitives (jittable)
# ----------------------------------------------------------------------
def _normalize(v, axis=-1):
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, 1e-30)


def moller_trumbore(orig, dirs, tri):
    """Batched ray-triangle intersection.

    orig/dirs: [R, 3]; tri: [T, 3, 3].
    Returns (t [R, T], hit [R, T] bool) with t the ray parameter."""
    v0 = tri[:, 0]
    e1 = tri[:, 1] - v0
    e2 = tri[:, 2] - v0
    # [R, T, 3]
    p = jnp.cross(dirs[:, None, :], e2[None])
    det = jnp.sum(p * e1[None], axis=-1)               # [R, T]
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1. / det, 0.)
    s = orig[:, None, :] - v0[None]                    # [R, T, 3]
    u = jnp.sum(s * p, axis=-1) * inv_det
    q = jnp.cross(s, e1[None])
    v = jnp.sum(dirs[:, None, :] * q, axis=-1) * inv_det
    t = jnp.sum(e2[None] * q, axis=-1) * inv_det
    hit = ((jnp.abs(det) > 1e-12) & (u >= -1e-9) & (v >= -1e-9)
           & (u + v <= 1. + 1e-9) & (t > _EPS))
    return t, hit


def nearest_hit(orig, dirs, tri, max_elems=16_000_000):
    """Nearest intersection per ray, chunking over triangles so the
    [rays, triangles] workspace stays bounded for large scenes.

    Returns (t_min [R], tri_idx [R], has_hit [R])."""
    num_rays = orig.shape[0]
    num_tri = tri.shape[0]
    if num_rays * num_tri <= max_elems:
        t, hit = moller_trumbore(orig, dirs, tri)
        t = jnp.where(hit, t, jnp.inf)
        idx = jnp.argmin(t, axis=-1)
        t_min = jnp.take_along_axis(t, idx[:, None], axis=1)[:, 0]
        return t_min, idx, jnp.isfinite(t_min)

    chunk = max(64, max_elems // max(num_rays, 1))
    n_chunks = -(-num_tri // chunk)
    pad = n_chunks * chunk - num_tri
    tri_p = jnp.concatenate(
        [tri, jnp.zeros((pad, 3, 3), tri.dtype)], axis=0)
    tri_c = tri_p.reshape(n_chunks, chunk, 3, 3)
    bases = jnp.arange(n_chunks) * chunk

    def body(carry, args):
        t_best, i_best = carry
        tri_chunk, base = args
        t, hit = moller_trumbore(orig, dirs, tri_chunk)
        t = jnp.where(hit, t, jnp.inf)
        i_loc = jnp.argmin(t, axis=-1)
        t_loc = jnp.take_along_axis(t, i_loc[:, None], axis=1)[:, 0]
        better = t_loc < t_best
        return (jnp.where(better, t_loc, t_best),
                jnp.where(better, base + i_loc, i_best)), None

    init = (jnp.full((num_rays,), jnp.inf),
            jnp.zeros((num_rays,), jnp.int64))
    (t_min, idx), _ = jax.lax.scan(body, init, (tri_c, bases))
    return t_min, idx, jnp.isfinite(t_min)


def any_blocking_hit(orig, dirs, tri, excl_ids=None,
                     max_elems=16_000_000):
    """Whether each segment [orig, orig+dirs] intersects any triangle
    with ray parameter in (eps, 1-eps), ignoring triangles listed in
    ``excl_ids`` [R, K]; chunked over triangles."""
    num_rays = orig.shape[0]
    num_tri = tri.shape[0]
    chunk = num_tri if num_rays * num_tri <= max_elems \
        else max(64, max_elems // max(num_rays, 1))
    n_chunks = -(-num_tri // chunk)
    pad = n_chunks * chunk - num_tri
    tri_p = jnp.concatenate(
        [tri, jnp.zeros((pad, 3, 3), tri.dtype)], axis=0)
    tri_c = tri_p.reshape(n_chunks, chunk, 3, 3)
    bases = jnp.arange(n_chunks) * chunk

    def body(blocked, args):
        tri_chunk, base = args
        t, hit = moller_trumbore(orig, dirs, tri_chunk)
        b = hit & (t > 1e-4) & (t < 1. - 1e-4)
        if excl_ids is not None:
            gid = base + jnp.arange(tri_chunk.shape[0])     # [chunk]
            excl = jnp.any(
                gid[None, None, :] == excl_ids[:, :, None], axis=1)
            b &= ~excl
        return blocked | jnp.any(b, axis=-1), None

    init = jnp.zeros((num_rays,), bool)
    blocked, _ = jax.lax.scan(body, init, (tri_c, bases))
    return blocked


def _tri_normals(tri):
    """[T, 3] unit normals"""
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    return _normalize(n)


def _trace(tri, normals, orig, dirs, depth):
    """Traces rays through ``depth`` specular bounces.

    Returns hit-triangle ids [R, depth] (-1 once escaped)."""
    num_rays = orig.shape[0]

    def body(carry, _):
        o, d, active = carry
        t_min, idx, found = nearest_hit(o, d, tri)
        has_hit = found & active
        n = normals[idx]                               # [R, 3]
        # flip normal to face the incoming ray
        n = jnp.where(jnp.sum(n * d, axis=-1, keepdims=True) > 0,
                      -n, n)
        p_hit = o + t_min[:, None] * d
        d_ref = d - 2. * jnp.sum(d * n, axis=-1, keepdims=True) * n
        o_new = jnp.where(has_hit[:, None],
                          p_hit + _EPS * d_ref, o)
        d_new = jnp.where(has_hit[:, None], d_ref, d)
        ids = jnp.where(has_hit, idx, -1)
        return (o_new, d_new, has_hit), ids

    active0 = jnp.ones((num_rays,), bool)
    _, ids = jax.lax.scan(body, (orig, dirs, active0), None,
                          length=depth)
    return jnp.transpose(ids)                          # [R, depth]


def _fibonacci_sphere(n):
    """[n, 3] quasi-uniform directions on the unit sphere"""
    i = np.arange(n) + 0.5
    phi = np.pi * (1. + np.sqrt(5.)) * i
    z = 1. - 2. * i / n
    r = np.sqrt(np.maximum(1. - z ** 2, 0.))
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1)


def _rot_matrix(orientation):
    """ZYX rotation matrix from [yaw, pitch, roll] (TR 38.901
    7.1-4)."""
    a, b, c = orientation
    ca, sa = np.cos(a), np.sin(a)
    cb, sb = np.cos(b), np.sin(b)
    cc, sc = np.cos(c), np.sin(c)
    return np.array([
        [ca * cb, ca * sb * sc - sa * cc, ca * sb * cc + sa * sc],
        [sa * cb, sa * sb * sc + ca * cc, sa * sb * cc - ca * sc],
        [-sb, cb * sc, cb * cc]])


def _unit_to_angles(v):
    """Unit vectors [..., 3] -> (theta, phi)"""
    theta = jnp.arccos(jnp.clip(v[..., 2], -1., 1.))
    phi = jnp.arctan2(v[..., 1], v[..., 0])
    return theta, phi


def _sph_basis(v):
    """Spherical unit vectors (e_theta, e_phi) transverse to
    direction v [..., 3]."""
    theta, phi = _unit_to_angles(v)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    e_theta = jnp.stack([ct * cp, ct * sp, -st], axis=-1)
    e_phi = jnp.stack([-sp, cp, jnp.zeros_like(sp)], axis=-1)
    return e_theta, e_phi


# ----------------------------------------------------------------------
# Paths container
# ----------------------------------------------------------------------
class Paths:
    """Propagation paths (API parity with sionna.rt.Paths).

    a : [num_rx, num_rx_ant, num_tx, num_tx_ant, num_paths] complex
        path coefficients (without Doppler)
    tau : [num_rx, num_tx, num_paths] delays [s]
    """

    def __init__(self, a, tau, valid, theta_t, phi_t, theta_r, phi_r,
                 doppler, interactions):
        self.a = a
        self.tau = tau
        self.valid = valid
        self.theta_t = theta_t
        self.phi_t = phi_t
        self.theta_r = theta_r
        self.phi_r = phi_r
        self.doppler = doppler
        self.interactions = interactions

    @property
    def num_paths(self):
        return self.a.shape[-1]

    def cir(self, sampling_frequency=None, num_time_steps=1,
            normalize_delays=False, out_type="jax"):
        """Channel impulse response with Doppler evolution.

        Returns (a [num_rx, num_rx_ant, num_tx, num_tx_ant,
        num_paths, num_time_steps], tau [num_rx, num_tx,
        num_paths])."""
        if sampling_frequency is None:
            sampling_frequency = 1.
        t = jnp.arange(num_time_steps) / sampling_frequency
        phase = jnp.exp(
            2j * PI * self.doppler[..., None] * t)   # [rx,tx,P,T]
        a = (self.a[..., None]
             * phase[:, None, :, None, :, :])
        tau = self.tau
        if normalize_delays:
            tau_min = jnp.min(
                jnp.where(self.valid, tau, jnp.inf), axis=-1,
                keepdims=True)
            tau_min = jnp.where(jnp.isfinite(tau_min), tau_min, 0.)
            tau = jnp.where(self.valid, tau - tau_min, tau)
        if out_type == "numpy":
            return np.asarray(a), np.asarray(tau)
        return a, tau


# ----------------------------------------------------------------------
# Path solver
# ----------------------------------------------------------------------
class PathSolver:
    """Computes specular propagation paths (LoS + up to ``max_depth``
    reflections) between all scene transmitters and receivers.

    Call: solver(scene, max_depth=3, max_num_paths_per_src=1000,
    samples_per_src=10000) -> Paths.
    """

    def __call__(self, scene, max_depth=3,
                 max_num_paths_per_src=100000,
                 samples_per_src=20000, los=True,
                 specular_reflection=True):
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

        tri = jnp.asarray(scene.triangles)
        has_geometry = scene.num_triangles > 0
        normals = _tri_normals(tri) if has_geometry else None

        tx_pos = np.stack([t.position for t in txs])
        rx_pos = np.stack([r.position for r in rxs])

        # ------------------------------------------------------------
        # 1) Candidate reflection sequences via shoot-and-bounce
        # ------------------------------------------------------------
        sequences = [np.zeros((1, 0), np.int64)] if los else []
        if specular_reflection and has_geometry and max_depth > 0:
            dirs = jnp.asarray(_fibonacci_sphere(samples_per_src))
            seq_set = set()
            for t in range(tx_pos.shape[0]):
                orig = jnp.broadcast_to(jnp.asarray(tx_pos[t]),
                                        dirs.shape)
                ids = np.asarray(_trace(tri, normals, orig, dirs,
                                        max_depth))
                for row in ids:
                    for d in range(1, max_depth + 1):
                        if row[d - 1] < 0:
                            break
                        seq_set.add(tuple(row[:d]))
            seq_set = sorted(seq_set)[:max_num_paths_per_src]
            by_len = {}
            for s in seq_set:
                by_len.setdefault(len(s), []).append(s)
            for d in sorted(by_len):
                sequences.append(np.asarray(by_len[d], np.int64))

        # ------------------------------------------------------------
        # 2) Image-method evaluation of every candidate
        # ------------------------------------------------------------
        lam = scene.wavelength
        freq = scene.frequency
        eta_tri = np.array(
            [m.complex_relative_permittivity(freq)
             for m in scene.triangle_materials]
            if has_geometry else [1. + 0j], np.complex128)
        scat_tri = np.array(
            [m.scattering_coefficient
             for m in scene.triangle_materials]
            if has_geometry else [0.], np.float64)

        results = []
        for seq in sequences:
            out = self._eval_sequences(
                scene, tri, normals, jnp.asarray(seq),
                jnp.asarray(tx_pos), jnp.asarray(rx_pos),
                jnp.asarray(eta_tri), jnp.asarray(scat_tri),
                txs, rxs)
            results.append(out)

        # Concatenate over path dim
        def cat(field):
            return jnp.concatenate([r[field] for r in results],
                                   axis=-1)

        a = jnp.concatenate([r["a"] for r in results], axis=-1)
        # Pad interaction records to a common depth with -1
        inter = [np.asarray(r["interactions"]) for r in results]
        width = max(max((i.shape[1] for i in inter), default=1), 1)
        inter = [np.pad(i, ((0, 0), (0, width - i.shape[1])),
                        constant_values=-1) for i in inter]
        depths = np.concatenate(
            [np.full(i.shape[0], i_len) for i, i_len in
             zip(inter, [r["interactions"].shape[1]
                         for r in results])])
        paths = Paths(
            a=a,
            tau=cat("tau"), valid=cat("valid"),
            theta_t=cat("theta_t"), phi_t=cat("phi_t"),
            theta_r=cat("theta_r"), phi_r=cat("phi_r"),
            doppler=cat("doppler"),
            interactions=np.concatenate(inter, axis=0))
        self._deduplicate(paths, depths)
        return paths

    @staticmethod
    def _deduplicate(paths, depths):
        """Invalidates duplicate paths per (rx, tx) link.

        A specular point on an edge shared by two coplanar triangles
        yields the same physical path once per triangle; keep one."""
        valid = np.array(paths.valid)
        tau = np.asarray(paths.tau)
        th_t = np.asarray(paths.theta_t)
        ph_t = np.asarray(paths.phi_t)
        num_rx, num_tx, num_p = valid.shape
        for r in range(num_rx):
            for t in range(num_tx):
                seen = {}
                for p in range(num_p):
                    if not valid[r, t, p]:
                        continue
                    key = (int(depths[p]),
                           round(float(tau[r, t, p]) * 1e12),
                           round(float(th_t[r, t, p]) * 1e6),
                           round(float(ph_t[r, t, p]) * 1e6))
                    if key in seen:
                        valid[r, t, p] = False
                    else:
                        seen[key] = p
        mask = jnp.asarray(valid)
        paths.valid = mask
        paths.a = paths.a * mask.astype(paths.a.dtype)[
            :, None, :, None, :]
        paths.tau = jnp.where(mask, paths.tau, -1.)

    # ------------------------------------------------------------------
    def _eval_sequences(self, scene, tri, normals, seq, tx_pos,
                        rx_pos, eta_tri, scat_tri, txs, rxs):
        """Evaluates all [S] reflection sequences of equal depth D for
        all TX/RX pairs.  Returns per-path fields with S paths."""
        lam = scene.wavelength
        num_tx = tx_pos.shape[0]
        num_rx = rx_pos.shape[0]
        s_count, depth = seq.shape

        tx_arr = scene.tx_array
        rx_arr = scene.rx_array
        nta = tx_arr.num_ant
        nra = rx_arr.num_ant

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
            valid &= self._in_triangle(x_k, a_v, b_v, c_v)
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

        # --- Occlusion: every segment must be free of intersections,
        # ignoring the reflecting triangles at its endpoints
        if scene.num_triangles > 0:
            for k in range(depth + 1):
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
                blocked = any_blocking_hit(o, d, tri,
                                           excl_ids=excl_ids)
                valid &= ~blocked.reshape(s_count, num_tx, num_rx)

        # --- Polarized field transfer (Jones matrix cascade)
        # basis vectors transverse to the first segment
        e_a, e_b = _sph_basis(d_hat[0])        # [S,tx,rx,3] each
        jones = jnp.broadcast_to(
            jnp.eye(2, dtype=jnp.complex64),
            (s_count, num_tx, num_rx, 2, 2))
        gain = jnp.ones((s_count, num_tx, num_rx), jnp.complex64)
        for k in range(depth):
            d_in = d_hat[k]
            d_out = d_hat[k + 1]
            n_k = n_pl[:, None, None, k]
            n_k = jnp.where(
                jnp.sum(n_k * d_in, axis=-1, keepdims=True) > 0,
                -n_k, n_k)
            cos_i = jnp.clip(-jnp.sum(d_in * n_k, axis=-1), 0., 1.)
            # s (TE) axis; fall back to e_a at normal incidence
            e_s = jnp.cross(d_in, n_k)
            s_norm = jnp.linalg.norm(e_s, axis=-1, keepdims=True)
            e_s = jnp.where(s_norm > 1e-6, e_s / jnp.maximum(
                s_norm, 1e-30), e_a)
            e_p_in = jnp.cross(e_s, d_in)
            e_p_out = jnp.cross(e_s, d_out)
            # Fresnel coefficients
            eta = eta_tri[seq[:, k]][:, None, None]
            sin2 = 1. - cos_i ** 2
            root = jnp.sqrt(eta - sin2)
            r_s = (cos_i - root) / (cos_i + root)
            r_p = (eta * cos_i - root) / (eta * cos_i + root)
            s_coef = jnp.sqrt(jnp.maximum(
                1. - scat_tri[seq[:, k]][:, None, None] ** 2, 0.))
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
            jones = refl @ rot @ jones
            e_a, e_b = e_s, e_p_out

        # Project onto the receive spherical basis (arrival direction
        # u_r = -d_hat[-1]; e_theta(-u)=e_theta(u), e_phi(-u)=-e_phi(u))
        u_r = -d_hat[-1]
        e_tr, e_pr = _sph_basis(u_r)
        proj = jnp.stack(
            [jnp.stack([jnp.sum(e_tr * e_a, -1),
                        jnp.sum(e_tr * e_b, -1)], -1),
             jnp.stack([jnp.sum(e_pr * e_a, -1),
                        jnp.sum(e_pr * e_b, -1)], -1)],
            axis=-2).astype(jnp.complex64)
        jones = proj @ jones                    # [S,tx,rx,2,2]

        # --- Antenna patterns in device-local frames
        theta_t_g, phi_t_g = _unit_to_angles(d_hat[0])
        theta_r_g, phi_r_g = _unit_to_angles(u_r)

        rot_tx = np.stack([_rot_matrix(t.orientation) for t in txs])
        rot_rx = np.stack([_rot_matrix(r.orientation) for r in rxs])
        d0_loc = jnp.einsum("tij,stri->strj",
                            jnp.asarray(rot_tx), d_hat[0])
        ur_loc = jnp.einsum("rij,stri->strj",
                            jnp.asarray(rot_rx), u_r)
        th_t_l, ph_t_l = _unit_to_angles(d0_loc)
        th_r_l, ph_r_l = _unit_to_angles(ur_loc)

        # F: ([S,tx,rx,ant] theta-comp, phi-comp)
        f_t_th, f_t_ph = scene.tx_array.field(th_t_l, ph_t_l)
        f_r_th, f_r_ph = scene.rx_array.field(th_r_l, ph_r_l)
        # Rotate local pattern components to the global basis: the
        # local spherical basis maps to the global one via the angle
        # between bases; compute via basis vectors
        e_th_t_l, e_ph_t_l = _sph_basis(d0_loc)
        e_th_t_g, e_ph_t_g = _sph_basis(d_hat[0])
        # global field = R^T (local basis vectors) . components
        rt_t = jnp.swapaxes(jnp.asarray(rot_tx), -2, -1)
        e_th_t_gl = jnp.einsum("tij,strj->stri", rt_t, e_th_t_l)
        e_ph_t_gl = jnp.einsum("tij,strj->stri", rt_t, e_ph_t_l)
        # projections onto the global (theta, phi) basis
        m_tt = jnp.sum(e_th_t_g * e_th_t_gl, -1)
        m_tp = jnp.sum(e_th_t_g * e_ph_t_gl, -1)
        m_pt = jnp.sum(e_ph_t_g * e_th_t_gl, -1)
        m_pp = jnp.sum(e_ph_t_g * e_ph_t_gl, -1)
        f_t_th_g = (m_tt[..., None] * f_t_th
                    + m_tp[..., None] * f_t_ph)
        f_t_ph_g = (m_pt[..., None] * f_t_th
                    + m_pp[..., None] * f_t_ph)

        e_th_r_l, e_ph_r_l = _sph_basis(ur_loc)
        e_th_r_g, e_ph_r_g = _sph_basis(u_r)
        rt_r = jnp.swapaxes(jnp.asarray(rot_rx), -2, -1)
        e_th_r_gl = jnp.einsum("rij,strj->stri", rt_r, e_th_r_l)
        e_ph_r_gl = jnp.einsum("rij,strj->stri", rt_r, e_ph_r_l)
        w_tt = jnp.sum(e_th_r_g * e_th_r_gl, -1)
        w_tp = jnp.sum(e_th_r_g * e_ph_r_gl, -1)
        w_pt = jnp.sum(e_ph_r_g * e_th_r_gl, -1)
        w_pp = jnp.sum(e_ph_r_g * e_ph_r_gl, -1)
        f_r_th_g = (w_tt[..., None] * f_r_th
                    + w_tp[..., None] * f_r_ph)
        f_r_ph_g = (w_pt[..., None] * f_r_th
                    + w_pp[..., None] * f_r_ph)

        # --- Combine: a[s,tx,rx,ra,ta] =
        #   F_r^T . J . F_t * lam/(4 pi d) * exp(-j2 pi d/lam)
        f_t = jnp.stack([f_t_th_g, f_t_ph_g],
                        axis=-2).astype(jnp.complex64)  # [S,t,r,2,ta]
        f_r = jnp.stack([f_r_th_g, f_r_ph_g],
                        axis=-2).astype(jnp.complex64)  # [S,t,r,2,ra]
        field = jnp.einsum("stria,strij,strjb->strab",
                           f_r, jones, f_t)  # [S,t,r,ra,ta]

        phase = jnp.exp(-2j * PI * total_len / lam)
        amp = (lam / (4. * PI * jnp.maximum(total_len, 1e-9))
               * phase).astype(jnp.complex64)

        # --- Array phase offsets (plane-wave / synthetic array)
        pos_t = jnp.asarray(scene.tx_array.positions(lam))  # [ta,3]
        pos_r = jnp.asarray(scene.rx_array.positions(lam))
        rot_pt = jnp.einsum("tij,aj->tai", rt_t, pos_t)
        rot_pr = jnp.einsum("rij,aj->rai", rt_r, pos_r)
        ph_t = jnp.exp(2j * PI / lam * jnp.einsum(
            "tai,stri->stra", rot_pt, d_hat[0]))
        ph_r = jnp.exp(-2j * PI / lam * jnp.einsum(
            "rai,stri->stra", rot_pr, u_r))
        a = (field * amp[..., None, None]
             * ph_r[..., :, None] * ph_t[..., None, :])

        # --- Doppler per path
        v_tx = jnp.asarray(np.stack([t.velocity for t in txs]))
        v_rx = jnp.asarray(np.stack([r.velocity for r in rxs]))
        fd = (scene.frequency / SPEED_OF_LIGHT) * (
            jnp.einsum("ti,stri->str", v_tx, d_hat[0])
            - jnp.einsum("ri,stri->str", v_rx, d_hat[-1]))

        # --- Mask invalid paths and reorder to Paths layout
        valid_c = valid.astype(jnp.complex64)
        a = a * valid_c[..., None, None]
        tau = jnp.where(valid, total_len / SPEED_OF_LIGHT, -1.)
        # [S,tx,rx,...] -> [rx, ra, tx, ta, S] etc.
        a = jnp.transpose(a, (2, 3, 1, 4, 0))
        out = {
            "a": a,
            "tau": jnp.transpose(jnp.where(valid, tau, -1.),
                                 (2, 1, 0)),
            "valid": jnp.transpose(valid, (2, 1, 0)),
            "theta_t": jnp.transpose(theta_t_g, (2, 1, 0)),
            "phi_t": jnp.transpose(phi_t_g, (2, 1, 0)),
            "theta_r": jnp.transpose(theta_r_g, (2, 1, 0)),
            "phi_r": jnp.transpose(phi_r_g, (2, 1, 0)),
            "doppler": jnp.transpose(jnp.where(valid, fd, 0.),
                                     (2, 1, 0)),
            "interactions": np.asarray(seq),
        }
        return out

    @staticmethod
    def _in_triangle(p, a, b, c):
        """Barycentric inside-test for points p against triangles
        (a, b, c), broadcasting over leading dims."""
        v0 = c - a
        v1 = b - a
        v2 = p - a
        d00 = jnp.sum(v0 * v0, -1)
        d01 = jnp.sum(v0 * v1, -1)
        d11 = jnp.sum(v1 * v1, -1)
        d20 = jnp.sum(v2 * v0, -1)
        d21 = jnp.sum(v2 * v1, -1)
        denom = d00 * d11 - d01 * d01
        denom = jnp.where(jnp.abs(denom) > 1e-18, denom, 1e-18)
        u = (d11 * d20 - d01 * d21) / denom
        v = (d00 * d21 - d01 * d20) / denom
        return (u >= -1e-6) & (v >= -1e-6) & (u + v <= 1. + 1e-6)
