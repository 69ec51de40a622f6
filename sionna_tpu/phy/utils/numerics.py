"""Root-finding utilities (API parity with reference
src/sionna/phy/utils/numerics.py:11-113; fresh JAX implementations).

Used by SYS fair power control. Implemented with ``lax.while_loop`` /
``lax.fori_loop`` so they compile under jit with static trip bounds.
"""

import jax
import jax.numpy as jnp

from ..config import config


def expand_bound(f, bound, expansion_factor=2.0, side="upper",
                 max_n_iter=100, precision=None, **kwargs):
    """Expands ``bound`` geometrically until ``f`` changes sign.

    For side="upper", finds b such that f(b) <= 0; for side="lower",
    finds b such that f(b) >= 0 (element-wise over a batch).
    """
    rdtype = (config.rdtype if precision is None
              else {"single": jnp.float32, "double": jnp.float64}[precision])
    bound = jnp.asarray(bound, rdtype)
    sign = 1.0 if side == "upper" else -1.0

    def cond(state):
        b, it = state
        val = f(b, **kwargs)
        return jnp.logical_and(jnp.any(sign * val > 0), it < max_n_iter)

    def body(state):
        b, it = state
        val = f(b, **kwargs)
        b = jnp.where(sign * val > 0, b * expansion_factor, b)
        return b, it + 1

    bound, _ = jax.lax.while_loop(cond, body, (bound, 0))
    return bound


def bisection_method(f, left, right, regula_falsi=False, expand_to_left=True,
                     expand_to_right=True, step_expand=2.0, eps_x=1e-5,
                     eps_y=1e-4, max_n_iter=100, return_brackets=False,
                     precision=None, **kwargs):
    """Bisection root finding of a batch of monotonically decreasing
    functions ``f`` on intervals [left, right].

    Returns (x_opt, f(x_opt)) (and brackets if requested).
    """
    rdtype = (config.rdtype if precision is None
              else {"single": jnp.float32, "double": jnp.float64}[precision])
    left = jnp.asarray(left, rdtype)
    right = jnp.asarray(right, rdtype)
    left, right = jnp.broadcast_arrays(left, right)

    if expand_to_right:
        right = expand_bound(f, right, step_expand, side="upper",
                             max_n_iter=max_n_iter, **kwargs)
    if expand_to_left:
        left = expand_bound(f, left, step_expand, side="lower",
                            max_n_iter=max_n_iter, **kwargs)

    def body(_, state):
        l, r = state
        fl = f(l, **kwargs)
        if regula_falsi:
            fr = f(r, **kwargs)
            denom = jnp.where(jnp.abs(fl - fr) < 1e-30, 1e-30, fl - fr)
            m = l + fl * (r - l) / denom
        else:
            m = 0.5 * (l + r)
        fm = f(m, **kwargs)
        # f decreasing: root right of m iff fm > 0
        l_new = jnp.where(fm > 0, m, l)
        r_new = jnp.where(fm > 0, r, m)
        # stop per-element when converged
        done = jnp.logical_or(jnp.abs(r - l) < eps_x, jnp.abs(fm) < eps_y)
        l_new = jnp.where(done, l, l_new)
        r_new = jnp.where(done, r, r_new)
        return l_new, r_new

    left, right = jax.lax.fori_loop(0, max_n_iter, body, (left, right))
    x_opt = 0.5 * (left + right)
    f_opt = f(x_opt, **kwargs)
    if return_brackets:
        return x_opt, f_opt, left, right
    return x_opt, f_opt
