"""Non-local blocks (`MViT/slowfast/models/nonlocal_helper.py`).

theta/phi/g 1x1x1 convs, optional phi/g max-pooling, dot-product or softmax
instantiation, output conv + zero-init BN residual. Channels-last.
"""

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pmv_tpu.models.common import max_pool_3d


class Nonlocal(nn.Module):
    dim_inner: int
    pool_size: Optional[Sequence[int]] = None
    instantiation: str = "softmax"
    norm: Any = None
    zero_init_final_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        b, t, h, w, c = x.shape
        theta = nn.Conv(self.dim_inner, (1, 1, 1), dtype=self.dtype,
                        name="conv_theta")(x)
        phi_in = g_in = x
        use_pool = self.pool_size is not None and any(
            s > 1 for s in self.pool_size
        )
        if use_pool:
            ks = tuple(self.pool_size)
            phi_in = max_pool_3d(x, ks, ks, [(0, 0)] * 3)
            g_in = phi_in
        phi = nn.Conv(self.dim_inner, (1, 1, 1), dtype=self.dtype,
                      name="conv_phi")(phi_in)
        g = nn.Conv(self.dim_inner, (1, 1, 1), dtype=self.dtype,
                    name="conv_g")(g_in)

        import jax

        theta_f = theta.reshape(b, -1, self.dim_inner)
        phi_f = phi.reshape(b, -1, self.dim_inner)
        g_f = g.reshape(b, -1, self.dim_inner)
        attn = jnp.einsum("bnc,bmc->bnm", theta_f, phi_f)
        if self.instantiation == "softmax":
            attn = jax.nn.softmax(attn * (self.dim_inner ** -0.5), axis=-1)
        elif self.instantiation == "dot_product":
            attn = attn / attn.shape[-1]
        else:
            raise NotImplementedError(self.instantiation)
        out = jnp.einsum("bnm,bmc->bnc", attn, g_f)
        out = out.reshape(b, t, h, w, self.dim_inner)
        out = nn.Conv(c, (1, 1, 1), dtype=self.dtype, name="conv_out")(out)
        bn = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
            scale_init=(
                nn.initializers.zeros
                if self.zero_init_final_norm
                else nn.initializers.ones
            ),
            name="bn",
        )
        out = bn(out)
        return x + out
