"""Int8 forward-activation quantization for dense matmuls (TPU.INT8_DENSE).

The v5e MXU runs int8 matmuls at 2x bf16 peak (394 vs 197 TOPS) and int8
operands halve the dot's HBM reads — the two levers the ROADMAP "plan to
400" identifies as the only remaining routes on a bandwidth-bound step.

This implements the standard W8A8 QAT forward with straight-through
gradients (reference semantics: the fp path of
`MViT/slowfast/models/attention.py:202-207` linears — quantization is a
pmv_tpu-only performance feature, default off):

  forward : y = (q8(x) @ q8(W)) * sx * sw      (int8 MXU, int32 accum)
  backward: dx = g @ W^T,  dW = x^T @ g        (full-precision, exact STE)

Scales are symmetric absmax — per-token (row) for activations, per-output-
channel (column) for weights — the combination that keeps transformer
training stable in the QAT literature (see PAPERS.md: LLM.int8 / SwitchBack
use exactly this split). The quantize chain (absmax -> scale -> round ->
clip -> cast) fuses into one VPU pass over the producer's output; the MXU
then reads int8.
"""

import jax
import jax.numpy as jnp
import flax.linen as nn

from typing import Any


def _quantize(t, axis):
    """Symmetric absmax int8 quantization along ``axis``.

    Returns (int8 values, f32 scale with keepdims). Zero rows get scale
    eps/127 and quantize to exact zeros.
    """
    tf = t.astype(jnp.float32)
    amax = jnp.max(jnp.abs(tf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(tf / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def int8_dot_fwd_only(x, w):
    """Quantized forward dot: x [..., K] @ w [K, M] via int8 MXU."""
    xq, sx = _quantize(x, axis=-1)          # sx: [..., 1]
    wq, sw = _quantize(w, axis=0)           # sw: [1, M]
    y = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * sx * sw).astype(x.dtype)


@jax.custom_vjp
def int8_dot(x, w):
    """int8-forward dot with exact straight-through gradients.

    The backward is bit-identical to autodiff of the unquantized
    ``x @ w`` (full-precision operands), so switching INT8_DENSE on/off
    changes only the forward rounding, never the gradient *formula*.
    """
    return int8_dot_fwd_only(x, w)


def _int8_dot_fwd(x, w):
    return int8_dot_fwd_only(x, w), (x, w)


def _int8_dot_bwd(res, g):
    x, w = res
    g = g.astype(jnp.promote_types(x.dtype, w.dtype))
    # dx = g @ w^T : contract g's last dim with w's output dim.
    dx = jax.lax.dot_general(
        g, w, dimension_numbers=(((g.ndim - 1,), (1,)), ((), ())),
    )
    # dW = x^T @ g summed over all leading (batch/token) dims.
    x2 = x.reshape(-1, x.shape[-1])
    g2 = g.reshape(-1, g.shape[-1])
    dw = jax.lax.dot_general(
        x2, g2, dimension_numbers=(((0,), (0,)), ((), ())),
    )
    return dx.astype(x.dtype), dw.astype(w.dtype)


int8_dot.defvjp(_int8_dot_fwd, _int8_dot_bwd)


class QuantDense(nn.Module):
    """Drop-in ``nn.Dense`` with the int8 forward dot.

    Parameter tree (``kernel`` [in, features], optional ``bias``) matches
    nn.Dense exactly, so checkpoints and the torch importer are untouched
    by flipping TPU.INT8_DENSE.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features)
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,))
            if self.use_bias
            else None
        )
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        y = int8_dot(x, kernel)
        if bias is not None:
            y = y + bias
        return y
