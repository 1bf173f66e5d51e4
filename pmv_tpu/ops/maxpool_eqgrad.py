"""Max pool with an equality-mask backward (no select_and_scatter).

XLA lowers the gradient of reduce_window(max) to select_and_scatter,
which runs at ~25 GB/s on v5e (0.72 ms for the block-1 skip pool,
tools/profile_step.py). This custom_vjp computes the same routing as a
phase-decomposed stack of shifted equality compares — pure fusible
elementwise work on the window grid.

Semantics note: on EXACT ties inside a window, select_and_scatter (and
torch's recorded-argmax backward, `video_model_builder.py` pool_skip)
routes the gradient to one winner; the equality mask routes it to every
tied position. Ties between distinct LN'd activations are measure-zero
in f32 and rare in bf16; the forward (and therefore inference parity) is
bit-identical. Gate: TPU.EQGRAD_SKIP_POOL.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _max_pool(x, kernel, stride, padding):
    dims = (1,) + tuple(kernel) + (1,)
    strides = (1,) + tuple(stride) + (1,)
    pads = ((0, 0),) + tuple(padding) + ((0, 0),)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, dims, strides, pads
    )


def _eligible(x_shape, kernel, stride, padding):
    """Phase interleave needs in = stride * out exactly on every axis."""
    for n, k, s, (lo, hi) in zip(x_shape[1:4], kernel, stride, padding):
        out = (n + lo + hi - k) // s + 1
        if out * s != n:
            return False
    return True


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def max_pool_3d_eqgrad(x, kernel, stride, padding):
    return _max_pool(x, kernel, stride, padding)


def _fwd(x, kernel, stride, padding):
    y = _max_pool(x, kernel, stride, padding)
    return y, (x, y)


def _bwd(kernel, stride, padding, res, dy):
    x, y = res
    b, t, h, w, c = x.shape
    to, ho, wo = y.shape[1:4]
    (pt, _), (ph, _), (pw, _) = padding
    kt, kh, kw = kernel
    st, sh, sw = stride
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (pt, pt), (ph, ph), (pw, pw), (0, 0)),
                 constant_values=neg)
    # phase_acc[(rt, rh, rw)] accumulates contributions landing on input
    # positions (st*i + rt, sh*j + rh, sw*k + rw).
    phases = {}
    for dt in range(kt):
        for dh in range(kh):
            for dw in range(kw):
                # Window (wt,wh,ww)'s tap reads padded index s*w + d, i.e.
                # input index s*w + d - p.
                xw = xp[:, dt:dt + st * to:st, dh:dh + sh * ho:sh,
                        dw:dw + sw * wo:sw]
                contrib = jnp.where(xw == y, dy, 0)
                r = ((dt - pt) % st, (dh - ph) % sh, (dw - pw) % sw)
                sft = ((dt - pt) // st, (dh - ph) // sh, (dw - pw) // sw)
                # Window w contributes to phase index w + sft; realize the
                # shift with pad+slice on the window grid.
                padcfg, slicer = [(0, 0)], [slice(None)]
                for o, n in zip(sft, (to, ho, wo)):
                    if o >= 0:
                        padcfg.append((o, 0))
                        slicer.append(slice(0, n))
                    else:
                        padcfg.append((0, -o))
                        slicer.append(slice(-o, n - o))
                padcfg.append((0, 0))
                slicer.append(slice(None))
                shifted = jnp.pad(contrib, padcfg)[tuple(slicer)]
                phases[r] = phases.get(r, 0) + shifted
    # Interleave phases back onto the input grid.
    grid = jnp.stack(
        [phases.get((rt, rh, rw), jnp.zeros_like(dy))
         for rt in range(st) for rh in range(sh) for rw in range(sw)],
        axis=-2,
    ).reshape(b, to, ho, wo, st, sh, sw, c)
    din = grid.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(x.shape)
    return (din,)


max_pool_3d_eqgrad.defvjp(_fwd, _bwd)
