"""Sharding strategies beyond pure DP on the virtual 8-device CPU mesh.

TPU.SHARD_STRATEGY: "dp" (reference-DDP equivalent), "dp_sp" (temporal
sequence parallelism over a (data, model) mesh — GSPMD halo exchange for
the pooling convs, K/V gathers for attention), "fsdp" (ZeRO-3-style
parameter sharding over the data axis). All three must produce the same
step numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _mvitv2_s_cfg
from pmv_tpu.engine import steps
from pmv_tpu.models import build_model
from pmv_tpu.parallel import mesh as mesh_lib
from pmv_tpu.utils import misc


def _cfg(strategy):
    cfg = _mvitv2_s_cfg(tiny=True)
    cfg.DATA.NUM_FRAMES = 4
    cfg.TPU.SHARD_STRATEGY = strategy
    return cfg


def _one_step(strategy):
    cfg = _cfg(strategy)
    model = build_model(cfg)
    rng = misc.root_key(cfg)
    rng_np = np.random.default_rng(0)
    batch = {
        "frames": jnp.asarray(
            rng_np.integers(0, 255, (8, 4, 16, 16, 3), dtype=np.uint8)
        ),
        "labels": jnp.asarray(
            rng_np.integers(0, 8, (8,), dtype=np.int64)
        ),
    }
    mesh = mesh_lib.create_mesh(cfg)
    state, tx = steps.init_state(cfg, model, batch, rng)
    state = mesh_lib.replicate(state, mesh, strategy)
    device_batch = mesh_lib.shard_batch(batch, mesh)
    train_step = jax.jit(steps.make_train_step(cfg, model, tx))
    state, metrics = train_step(state, device_batch, rng, 1e-4)
    return float(metrics["loss"]), mesh


@pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual mesh"
)
def test_dp_sp_and_fsdp_match_dp():
    loss_dp, mesh_dp = _one_step("dp")
    assert mesh_dp.shape == {"data": 8}
    loss_sp, mesh_sp = _one_step("dp_sp")
    assert dict(mesh_sp.shape) == {"data": 4, "model": 2}
    loss_fsdp, mesh_f = _one_step("fsdp")
    np.testing.assert_allclose(loss_sp, loss_dp, rtol=2e-2)
    np.testing.assert_allclose(loss_fsdp, loss_dp, rtol=2e-2)


@pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual mesh"
)
def test_dp_sp_batch_sharding_layout():
    cfg = _cfg("dp_sp")
    mesh = mesh_lib.create_mesh(cfg)
    frames = jnp.zeros((8, 4, 16, 16, 3), jnp.uint8)
    out = mesh_lib.shard_batch({"frames": frames}, mesh)
    spec = out["frames"].sharding.spec
    assert tuple(spec) == ("data", "model")


# Model-compile / multi-minute tier: excluded from the default
# selection (pyproject addopts -m 'not slow'); run with -m slow or
# -m "slow or not slow" for the full suite.
pytestmark = pytest.mark.slow
