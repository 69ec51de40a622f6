"""MIMO detectors (reference: src/sionna/phy/mimo/detection.py:24,145,
539,1039,1314; fresh JAX implementations).

TPU design notes:
* ML enumerates all num_points^K joint vectors as one dense
  [.., 2^(K*bits)] distance tensor -> masked logsumexp/min reductions
  (pure VPU work, no control flow).
* K-Best runs a static per-level Python loop at trace time with
  ``jax.lax.top_k`` for list pruning - fully batched, no sorting
  networks needed.
* EP and MMSE-PIC iterate with ``lax.fori_loop`` over fixed iteration
  counts; all linear algebra is batched Cholesky on the MXU.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..block import Block
from ..mapping import (Constellation, Demapper, SymbolLogits2LLRs,
                       LLRs2SymbolLogits, SymbolLogits2Moments,
                       PAM2QAM, pam, qam)
from ..utils.tensors import expand_to_rank
from ..utils.linalg import batched_cholesky, cholesky_solve
from .equalization import lmmse_equalizer, zf_equalizer, mf_equalizer
from .utils import (whiten_channel, complex2real_channel,
                    complex2real_matrix, complex2real_vector,
                    List2LLRSimple)

__all__ = ["LinearDetector", "MaximumLikelihoodDetector",
           "KBestDetector", "EPDetector", "MMSEPICDetector"]


class LinearDetector(Block):
    """Equalizer + per-stream demapper (reference detection.py:24)."""

    def __init__(self, equalizer, output, demapping_method,
                 constellation_type=None, num_bits_per_symbol=None,
                 constellation=None, hard_out=False, precision=None,
                 **kwargs):
        super().__init__(precision=precision, **kwargs)
        if isinstance(equalizer, str):
            if equalizer not in ("lmmse", "zf", "mf"):
                raise ValueError("Unknown equalizer.")
            self._equalizer = {"lmmse": lmmse_equalizer,
                               "zf": zf_equalizer,
                               "mf": mf_equalizer}[equalizer]
        else:
            self._equalizer = equalizer
        if output not in ("bit", "symbol"):
            raise ValueError("Unknown output")
        if demapping_method not in ("app", "maxlog"):
            raise ValueError("Unknown demapping method")
        self._output = output
        self._hard_out = bool(hard_out)
        self._constellation = Constellation.check_or_create(
            constellation_type=constellation_type,
            num_bits_per_symbol=num_bits_per_symbol,
            constellation=constellation, precision=precision)

        if output == "bit":
            from ..mapping import Demapper
            self._demapper = Demapper(
                demapping_method, constellation=self._constellation,
                hard_out=hard_out, precision=precision)
        else:
            from ..mapping import SymbolDemapper
            self._demapper = SymbolDemapper(
                constellation=self._constellation, hard_out=hard_out,
                precision=precision)

    def call(self, y, h, s):
        x_hat, no_eff = self._equalizer(y, h, s,
                                        precision=self.precision)
        out = self._demapper(x_hat, no_eff)
        if self._output == "bit":
            # reshape to [..., num_streams, num_bits_per_symbol]
            k = self._constellation.num_bits_per_symbol
            out = jnp.reshape(out, out.shape[:-1]
                              + (x_hat.shape[-1], k))
        return out


class MaximumLikelihoodDetector(Block):
    """Exact ML detection over all joint symbol vectors
    (reference detection.py:145)."""

    def __init__(self, output, demapping_method, num_streams,
                 constellation_type=None, num_bits_per_symbol=None,
                 constellation=None, hard_out=False, precision=None,
                 **kwargs):
        super().__init__(precision=precision, **kwargs)
        if output not in ("bit", "symbol"):
            raise ValueError("Unknown output")
        if demapping_method not in ("app", "maxlog"):
            raise ValueError("Unknown demapping method")
        self._output = output
        self._demapping_method = demapping_method
        self._hard_out = bool(hard_out)
        self._num_streams = int(num_streams)
        self._constellation = Constellation.check_or_create(
            constellation_type=constellation_type,
            num_bits_per_symbol=num_bits_per_symbol,
            constellation=constellation, precision=precision)
        num_points = self._constellation.num_points
        k = self._num_streams

        # all joint symbol index vectors: [num_points^K, K]
        grids = np.meshgrid(*[np.arange(num_points)] * k, indexing="ij")
        vecs = np.stack([g.reshape(-1) for g in grids], axis=-1)
        self._vecs_ind = vecs.astype(np.int32)  # [L, K]

        nbps = self._constellation.num_bits_per_symbol
        ints = vecs
        shifts = np.arange(nbps - 1, -1, -1)
        # bits of each stream of each joint vector: [L, K, nbps]
        self._vecs_bits = ((ints[..., None] >> shifts) & 1).astype(
            np.int32)

    def call(self, y, h, s, prior=None):
        y = jnp.asarray(y, self.cdtype)
        h = jnp.asarray(h, self.cdtype)
        s = jnp.asarray(s, self.cdtype)
        y, h = whiten_channel(y, h, s, return_s=False)

        points = self._constellation()
        vecs_ind = jnp.asarray(self._vecs_ind)         # [L, K]
        x_vecs = jnp.take(points, vecs_ind, axis=0)    # [L, K]
        # hx: [..., L, M]: h [..., M, K] @ x [L, K]
        hx = jnp.einsum("...mk,lk->...lm", h, x_vecs)
        dist = jnp.sum(jnp.abs(y[..., None, :] - hx) ** 2, axis=-1)
        exponents = -dist  # [..., L]

        if prior is not None:
            prior = jnp.asarray(prior, self.rdtype)
            if self._output == "bit":
                # prior: [..., K, nbps] LLRs -> log Pr(x).
                # exponents is [..., L] (batch rank + 1) so the fully
                # batched prior has rank exponents.ndim + 1
                prior_e = expand_to_rank(prior, exponents.ndim + 1,
                                         axis=0)
                pm1 = 2 * jnp.asarray(self._vecs_bits) - 1  # [L,K,nbps]
                lp = jax.nn.log_sigmoid(prior_e[..., None, :, :] * pm1)
                exponents = exponents + jnp.sum(lp, axis=(-2, -1))
            else:
                # prior: [..., K, num_points] logits.  For joint
                # vector l, add sum_k prior[..., k, vecs_ind[l, k]].
                # The reference adds the raw (unnormalized) logits
                # (detection.py:409), so no log-softmax here — the
                # returned symbol logits carry the same offset.
                logp_e = expand_to_rank(prior, exponents.ndim + 1,
                                        axis=0)
                k_ind = jnp.arange(self._num_streams)[None, :]  # [1,K]
                sel = logp_e[..., k_ind, vecs_ind]  # [..., L, K]
                exponents = exponents + jnp.sum(sel, axis=-1)

        reduce = (jax.scipy.special.logsumexp
                  if self._demapping_method == "app" else jnp.max)
        neg_inf = jnp.asarray(-jnp.inf, self.rdtype)

        if self._output == "symbol":
            num_points = self._constellation.num_points
            # logits[..., K, num_points]
            one_hot = jnp.asarray(self._vecs_ind)  # [L, K]
            mask = one_hot[..., None] == jnp.arange(num_points)  # L,K,P
            masked = jnp.where(mask, exponents[..., None, None],
                               neg_inf)
            logits = reduce(masked, axis=-3) if \
                self._demapping_method == "app" else \
                jnp.max(masked, axis=-3)
            if self._hard_out:
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return logits

        # bit output
        bits = jnp.asarray(self._vecs_bits)  # [L, K, nbps]
        x = exponents[..., None, None]
        masked1 = jnp.where(bits == 1, x, neg_inf)
        masked0 = jnp.where(bits == 0, x, neg_inf)
        if self._demapping_method == "app":
            llr = (jax.scipy.special.logsumexp(masked1, axis=-3)
                   - jax.scipy.special.logsumexp(masked0, axis=-3))
        else:
            llr = jnp.max(masked1, axis=-3) - jnp.max(masked0, axis=-3)
        if self._hard_out:
            return (llr > 0).astype(self.rdtype)
        return llr


class KBestDetector(Block):
    """K-Best tree-search detector (reference detection.py:539).

    Whitens the channel, optionally converts to the real-valued
    representation, sorts streams by channel energy, QR-decomposes, and
    expands/prunes K best partial paths per level with
    ``jax.lax.top_k``.
    """

    def __init__(self, output, num_streams, k, constellation_type=None,
                 num_bits_per_symbol=None, constellation=None,
                 hard_out=False, use_real_rep=False, list2llr=None,
                 precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        if output not in ("bit", "symbol"):
            raise ValueError("Unknown output")
        self._output = output
        self._hard_out = bool(hard_out)
        self._use_real_rep = bool(use_real_rep)

        constellation = Constellation.check_or_create(
            constellation_type=constellation_type,
            num_bits_per_symbol=num_bits_per_symbol,
            constellation=constellation, precision=precision)
        self._constellation = constellation
        nbps = constellation.num_bits_per_symbol

        if self._use_real_rep:
            if constellation.constellation_type != "qam":
                raise ValueError(
                    "The real-valued representation is only supported "
                    "for QAM constellations")
            self._num_streams = 2 * int(num_streams)
            self._nbps_search = nbps // 2
            self._points_search = np.real(
                pam(nbps // 2, normalize=False)).astype(self.np_rdtype)
            # normalize like the parent QAM constellation
            n = nbps // 2
            pam_var = 1 / (2 ** (n - 2)) * np.sum(
                np.linspace(1, 2 ** n - 1, 2 ** (n - 1)) ** 2) / 2
            self._points_search = self._points_search / np.sqrt(pam_var)
            self._pam2qam = PAM2QAM(nbps)
        else:
            self._num_streams = int(num_streams)
            self._nbps_search = nbps
            self._points_search = None  # complex points at call time
        self._num_points_search = 2 ** self._nbps_search
        self._k = int(min(k, self._num_points_search
                          ** min(self._num_streams, 5)))

        if output == "bit":
            if list2llr is None:
                list2llr = List2LLRSimple(nbps, precision=precision)
            self._list2llr = list2llr
        else:
            self._list2llr = None

    @property
    def k(self):
        return self._k

    def _search(self, y, r, points):
        """Runs the K-best search.

        y: [..., S] (real or complex), r: [..., S, S] upper triangular,
        points: [P] candidate set. Returns (dists [..., K],
        path_inds [..., K, S], path_syms [..., K, S]).
        """
        s_dim = self._num_streams
        p = self._num_points_search
        k = self._k
        batch_shape = y.shape[:-1]

        # start with a single empty path
        dists = jnp.zeros(batch_shape + (1,), self.rdtype)
        path_inds = jnp.zeros(batch_shape + (1, 0), jnp.int32)
        path_syms = jnp.zeros(batch_shape + (1, 0), points.dtype)

        for level in range(s_dim - 1, -1, -1):
            num_paths = path_inds.shape[-2]
            # interference from already-detected streams
            if path_syms.shape[-1] > 0:
                r_row = r[..., level, level + 1:]  # [..., detected]
                interf = jnp.einsum("...d,...pd->...p", r_row,
                                    path_syms)
            else:
                interf = jnp.zeros(batch_shape + (num_paths,),
                                   points.dtype)
            # candidate distances for all (path, point) combos
            y_l = y[..., level][..., None]
            r_ll = r[..., level, level][..., None]
            # [..., paths, P]
            e = y_l[..., None] - interf[..., None] \
                - r_ll[..., None] * points
            d_new = dists[..., None] + jnp.abs(e) ** 2
            d_flat = jnp.reshape(d_new,
                                 batch_shape + (num_paths * p,))
            keep = min(k, num_paths * p)
            neg_d, top_idx = jax.lax.top_k(-d_flat, keep)
            dists = -neg_d
            parent = top_idx // p
            point_idx = top_idx % p
            # gather parent paths and append the new symbol
            path_inds = jnp.take_along_axis(
                path_inds, parent[..., None], axis=-2)
            path_syms = jnp.take_along_axis(
                path_syms, parent[..., None], axis=-2)
            path_inds = jnp.concatenate(
                [point_idx[..., None], path_inds], axis=-1)
            path_syms = jnp.concatenate(
                [jnp.take(points, point_idx, axis=0)[..., None],
                 path_syms], axis=-1)
        return dists, path_inds, path_syms

    def call(self, y, h, s):
        y = jnp.asarray(y, self.cdtype)
        h = jnp.asarray(h, self.cdtype)
        s = jnp.asarray(s, self.cdtype)
        y, h = whiten_channel(y, h, s, return_s=False)

        if self._use_real_rep:
            y = complex2real_vector(y)
            h = complex2real_matrix(h)
            # the real noise has covariance I/2; rescale to unit
            y = y * np.sqrt(2.)
            h = h * np.sqrt(2.)
            points = jnp.asarray(self._points_search, self.rdtype)
        else:
            points = self._constellation()

        # sort streams by increasing column norm so that the
        # strongest stream is detected first (last QR level)
        col_norms = jnp.sum(jnp.abs(h) ** 2, axis=-2)
        order = jnp.argsort(col_norms, axis=-1)
        h_sorted = jnp.take_along_axis(h, order[..., None, :], axis=-1)

        q, r = jnp.linalg.qr(h_sorted)
        y_eff = jnp.matmul(jnp.conjugate(jnp.swapaxes(q, -2, -1)),
                           y[..., None])[..., 0]
        if self._use_real_rep:
            y_eff = jnp.real(y_eff)
            r = jnp.real(r)

        dists, path_inds, path_syms = self._search(y_eff, r, points)

        # undo the stream sorting: path entries are ordered by level
        # 0..S-1 which corresponds to sorted streams
        inv_order = jnp.argsort(order, axis=-1)

        if self._output == "symbol":
            # best path = first (smallest distance)
            best = path_inds[..., 0, :]  # [..., S] sorted order
            best = jnp.take_along_axis(best, inv_order, axis=-1)
            if self._use_real_rep:
                s_half = self._num_streams // 2
                best = self._pam2qam(best[..., :s_half],
                                     best[..., s_half:])
            if self._hard_out:
                return best
            # build logits: -dist for visited candidates
            raise NotImplementedError(
                "Soft symbol output requires hard_out=True for "
                "KBestDetector")

        # bit output via list2llr on candidate lists (sorted order)
        if self._use_real_rep:
            s_half = self._num_streams // 2
            # combine PAM pairs into QAM indices per path
            pi = jnp.take_along_axis(
                path_inds,
                jnp.broadcast_to(inv_order[..., None, :],
                                 path_inds.shape), axis=-1)
            qam_inds = self._pam2qam(pi[..., :s_half],
                                     pi[..., s_half:])
            llr = self._list2llr(None, None, dists, qam_inds, None)
            return llr
        pi = jnp.take_along_axis(
            path_inds,
            jnp.broadcast_to(inv_order[..., None, :], path_inds.shape),
            axis=-1)
        llr = self._list2llr(None, None, dists, pi, None)
        return llr


class EPDetector(Block):
    """Expectation-propagation detector (reference detection.py:1039).

    Works on the real-valued channel representation with PAM
    half-constellations; ``l`` EP iterations with damping ``beta``.
    """

    def __init__(self, output, num_bits_per_symbol, hard_out=False,
                 l=10, beta=0.9, precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        if output not in ("bit", "symbol"):
            raise ValueError("Unknown output")
        self._output = output
        self._hard_out = bool(hard_out)
        if not 1 <= l:
            raise ValueError("l must be >= 1")
        if not 0 < beta <= 1:
            raise ValueError("beta must be in (0, 1]")
        self._l = int(l)
        self._beta = float(beta)
        self._num_bits_per_symbol = int(num_bits_per_symbol)
        nbps_pam = self._num_bits_per_symbol // 2
        # normalized PAM half-constellation (same scaling as QAM)
        p = np.real(pam(nbps_pam, normalize=False))
        n = nbps_pam
        qam_var = 1 / (2 ** (n - 2)) * np.sum(
            np.linspace(1, 2 ** n - 1, 2 ** (n - 1)) ** 2) / 2 * 2
        self._pam_points = (p / np.sqrt(qam_var)).astype(self.np_rdtype)
        self._pam2qam = PAM2QAM(self._num_bits_per_symbol,
                                hard_in_out=False)
        self._pam2qam_hard = PAM2QAM(self._num_bits_per_symbol,
                                     hard_in_out=True)
        self._symbollogits2llrs = SymbolLogits2LLRs(
            "maxlog", self._num_bits_per_symbol, hard_out=hard_out,
            precision=precision)

    def call(self, y, h, s):
        y = jnp.asarray(y, self.cdtype)
        h = jnp.asarray(h, self.cdtype)
        s = jnp.asarray(s, self.cdtype)
        # whiten and convert to real
        y, h, s = whiten_channel(y, h, s)
        y, h, s = complex2real_channel(y, h, s)
        # after whitening+real conversion noise cov = I/2
        sigma2 = 0.5
        k2 = h.shape[-1]  # 2 * num_streams
        points = jnp.asarray(self._pam_points, self.rdtype)  # [P]
        es = jnp.asarray(np.mean(self._pam_points ** 2), self.rdtype)

        hth = jnp.matmul(jnp.swapaxes(h, -2, -1), h) / sigma2
        hty = jnp.matmul(jnp.swapaxes(h, -2, -1),
                         y[..., None])[..., 0] / sigma2

        lam0 = jnp.ones(y.shape[:-1] + (k2,), self.rdtype) / es
        gam0 = jnp.zeros(y.shape[:-1] + (k2,), self.rdtype)

        # numerical-stability floor (reference: paragraph after
        # Eq. (38) of EP2014 — 1e-6 single / 1e-12 double)
        prec = 1e-12 if self.rdtype == jnp.float64 else 1e-6

        def moments(mean_cav, var_cav):
            # discrete posterior over PAM points
            logits = -(mean_cav[..., None] - points) ** 2 \
                / (2 * var_cav[..., None])
            p_post = jax.nn.softmax(logits, axis=-1)
            mu = jnp.sum(p_post * points, axis=-1)
            var = jnp.sum(p_post * (points - mu[..., None]) ** 2,
                          axis=-1)
            var = jnp.maximum(var, prec)
            return mu, var, logits

        def body(i, state):
            lam, gam, _ = state
            eye = jnp.eye(k2, dtype=self.rdtype)
            a = hth + lam[..., None, :] * eye
            chol = batched_cholesky(a)
            eye = jnp.broadcast_to(jnp.eye(k2, dtype=a.dtype), a.shape)
            ainv = cholesky_solve(chol, eye)
            sig_diag = jnp.diagonal(ainv, axis1=-2, axis2=-1)
            mu = jnp.matmul(ainv, (hty + gam)[..., None])[..., 0]
            # cavity: clamp the RESULT (reference Eq. (31)), not the
            # denominator — a negative 1/sigma - lam must floor to
            # `prec`, not blow up to 1/eps
            var_cav = jnp.maximum(1 / (1 / sig_diag - lam), prec)
            mean_cav = var_cav * (mu / sig_diag - gam)
            mu_p, var_p, logits = moments(mean_cav, var_cav)
            lam_new = 1 / var_p - 1 / var_cav
            gam_new = mu_p / var_p - mean_cav / var_cav
            # reject only NEGATIVE lambda updates (reference Eq. 35-36)
            valid = lam_new >= 0
            lam_new = jnp.where(valid, lam_new, lam)
            gam_new = jnp.where(valid, gam_new, gam)
            # damping (reference Eq. (37)-(38)): beta weights the OLD
            # value
            lam = (1 - self._beta) * lam_new + self._beta * lam
            gam = (1 - self._beta) * gam_new + self._beta * gam
            return lam, gam, logits

        logits0 = jnp.zeros(y.shape[:-1]
                            + (k2, self._pam_points.shape[0]),
                            self.rdtype)
        _, _, logits = jax.lax.fori_loop(0, self._l, body,
                                         (lam0, gam0, logits0))

        # combine the two PAM dims of each stream into QAM logits
        s_half = k2 // 2
        logits_qam = self._pam2qam(logits[..., :s_half, :],
                                   logits[..., s_half:, :])
        if self._output == "symbol":
            if self._hard_out:
                return jnp.argmax(logits_qam, axis=-1).astype(jnp.int32)
            return logits_qam
        return self._symbollogits2llrs(logits_qam)


class MMSEPICDetector(Block):
    """MMSE parallel-interference-cancellation detector
    (reference detection.py:1314).

    Soft-input soft-output: priors (LLRs or symbol logits) are used to
    compute soft interference estimates which are cancelled before
    per-stream MMSE filtering; ``num_iter`` iterations.
    """

    def __init__(self, output, demapping_method="maxlog", num_iter=1,
                 constellation_type=None, num_bits_per_symbol=None,
                 constellation=None, hard_out=False, precision=None,
                 **kwargs):
        super().__init__(precision=precision, **kwargs)
        if output not in ("bit", "symbol"):
            raise ValueError("Unknown output")
        if demapping_method not in ("app", "maxlog"):
            raise ValueError("Unknown demapping method")
        self._output = output
        self._demapping_method = demapping_method
        self._num_iter = int(num_iter)
        self._hard_out = bool(hard_out)
        self._constellation = Constellation.check_or_create(
            constellation_type=constellation_type,
            num_bits_per_symbol=num_bits_per_symbol,
            constellation=constellation, precision=precision)
        nbps = self._constellation.num_bits_per_symbol
        self._llrs2logits = LLRs2SymbolLogits(nbps, precision=precision)
        self._logits2moments = SymbolLogits2Moments(
            constellation=self._constellation, precision=precision)
        self._logits2llrs = SymbolLogits2LLRs(
            "maxlog", nbps, hard_out=False, precision=precision)
        self._llrs2logits_out = LLRs2SymbolLogits(
            nbps, hard_out=hard_out, precision=precision)
        self._bit_demapper = Demapper(
            demapping_method, constellation=self._constellation,
            precision=precision)
        self._epsilon = 1e-4  # reference detection.py:1462

    def call(self, y, h, s, prior=None):
        # LLR-domain self-iteration matching the reference
        # (detection.py:1497): each round demaps WITH the previous
        # round's LLRs as prior, and the final output is the
        # EXTRINSIC llr_d - llr_a.
        y = jnp.asarray(y, self.cdtype)
        h = jnp.asarray(h, self.cdtype)
        s = jnp.asarray(s, self.cdtype)
        y, h = whiten_channel(y, h, s, return_s=False)
        k = h.shape[-1]
        nbps = self._constellation.num_bits_per_symbol
        points = self._constellation()

        if prior is None:
            if self._output == "bit":
                prior = jnp.zeros(y.shape[:-1] + (k, nbps), self.rdtype)
            else:
                prior = jnp.zeros(y.shape[:-1]
                                  + (k, points.shape[0]), self.rdtype)
        else:
            prior = jnp.asarray(prior, self.rdtype)

        if self._output == "symbol":
            llr_d = self._logits2llrs(prior)
        else:
            llr_d = prior

        def one_iter(llr_a):
            logits = self._llrs2logits(llr_a)
            x_hat, var_x = self._logits2moments(logits)
            # residual after cancelling all soft estimates
            y_res = y - jnp.matmul(h, x_hat.astype(
                self.cdtype)[..., None])[..., 0]
            # per-stream error covariance: A = H E H^H + I,
            # E = diag(var)
            he = h * var_x[..., None, :].astype(self.cdtype)
            a = jnp.matmul(he, jnp.conjugate(jnp.swapaxes(h, -2, -1)))
            a = a + jnp.broadcast_to(jnp.eye(h.shape[-2],
                                             dtype=self.cdtype),
                                     a.shape)
            chol = batched_cholesky(a)
            ainv_h = cholesky_solve(chol, h)
            # mu_k = h_k^H A^{-1} h_k
            mu = jnp.real(jnp.sum(jnp.conjugate(h) * ainv_h, axis=-2))
            # filter output for each stream with its own soft symbol
            # added back: z_k = h_k^H A^-1 (y_res + h_k x_hat_k)
            z = jnp.sum(jnp.conjugate(ainv_h)
                        * y_res[..., None], axis=-2)
            z = z + mu.astype(self.cdtype) * x_hat
            # unbiased scaling (reference: rho = mu/(1 - var mu),
            # no_eff = 1/rho, both with an epsilon floor)
            x_eq = z / mu.astype(self.cdtype)
            no_eff = jnp.maximum(1. - var_x * mu,
                                 self._epsilon) / mu
            # demap WITH the prior (APP including llr_a)
            llr = self._bit_demapper(x_eq, no_eff, llr_a)
            return llr.reshape(llr_a.shape)

        llr_a = jnp.zeros_like(llr_d)
        for _ in range(self._num_iter):
            llr_a = llr_d
            llr_d = one_iter(llr_a)

        llr_e = llr_d - llr_a
        if self._output == "symbol":
            return self._llrs2logits_out(llr_e)
        if self._hard_out:
            return (llr_e > 0).astype(self.rdtype)
        return llr_e
