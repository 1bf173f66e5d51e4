"""Device mesh + sharding utilities.

TPU-native replacement for the reference's mp.spawn/DDP/NCCL runtime
(`MViT/slowfast/utils/{multiprocessing,distributed}.py`, SURVEY.md section
2.5): a single-controller JAX program lays a Mesh over all devices; the
train step is jitted with NamedSharding constraints and XLA inserts ICI/DCN
collectives for gradient reduction. `NUM_GPUS`/`NUM_SHARDS` keep their
config meaning (devices per host x hosts) for recipe compatibility, but the
mesh is always global.
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pmv_tpu.utils import logging as pmv_logging

logger = pmv_logging.get_logger(__name__)


def init_distributed(cfg):
    """Multi-host rendezvous (`jax.distributed.initialize`).

    Replaces torch init_process_group + TCP store (`multiprocessing.py:36-55`).
    No-op for single-process jobs.
    """
    if cfg.NUM_SHARDS > 1 and cfg.TPU.COORDINATOR_ADDRESS:
        if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
            # CPU multi-process (tests / local rehearsal of a multi-host
            # job): pin the platform through the config (plugin discovery
            # can override the env var) and use gloo cross-process
            # collectives — without this the distributed client connects
            # but process_count stays 1.
            try:
                jax.config.update("jax_platforms", "cpu")
                jax.config.update(
                    "jax_cpu_collectives_implementation", "gloo"
                )
            except Exception:
                pass
        jax.distributed.initialize(
            coordinator_address=cfg.TPU.COORDINATOR_ADDRESS,
            num_processes=(
                cfg.TPU.NUM_PROCESSES
                if cfg.TPU.NUM_PROCESSES > 0
                else cfg.NUM_SHARDS
            ),
            process_id=(
                cfg.TPU.PROCESS_ID if cfg.TPU.PROCESS_ID >= 0 else cfg.SHARD_ID
            ),
        )


def create_mesh(cfg=None, devices=None, axis_names=None, shape=None):
    """Build a Mesh. Default: 1-D data-parallel mesh over all devices."""
    devices = devices if devices is not None else jax.devices()
    if cfg is not None:
        axis_names = axis_names or tuple(cfg.TPU.MESH_AXES)
        shape = shape or (tuple(cfg.TPU.MESH_SHAPE) or None)
        if (
            not shape
            and cfg.TPU.SHARD_STRATEGY == "dp_sp"
            and len(devices) % 2 == 0
            and "model" not in (axis_names or ())
        ):
            # Default (data, model) split for sequence parallelism.
            shape = (len(devices) // 2, 2)
            axis_names = ("data", "model")
    axis_names = tuple(axis_names or ("data",))
    if shape:
        assert int(np.prod(shape)) == len(devices), (
            f"mesh shape {shape} != {len(devices)} devices"
        )
        dev_array = np.asarray(devices).reshape(shape)
    else:
        dev_array = np.asarray(devices).reshape((len(devices),) + (1,) * (len(axis_names) - 1))
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh, ndim=None):
    """Shard the leading (batch) axis over the 'data' mesh axis.

    With a 2-D (data, model) mesh and a rank-5 video tensor, the temporal
    axis additionally shards over 'model' — sequence parallelism. The
    reference has no analogue (DDP only, SURVEY.md section 2.5); on TPU the
    t-major token flatten keeps temporal shards contiguous, pooled K/V is
    small, and GSPMD inserts the halo exchanges for the pooling convs and
    the K/V all-gathers for attention over ICI.
    """
    if (
        ndim == 5
        and "model" in mesh.axis_names
        and mesh.shape["model"] > 1
    ):
        return NamedSharding(mesh, P("data", "model"))
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def data_shard_count(cfg):
    """Size of the 'data' mesh axis the train/eval step will run under.

    Model code sees the *global* (jit-traced) batch; per-shard gates (e.g.
    MVIT.FLAT_POOLS_MAX_BATCH) must be scaled by this before comparing."""
    try:
        n = jax.device_count()
    except Exception:  # pragma: no cover - no backend at build time
        return 1
    if cfg is None:
        return n
    if cfg.TPU.MESH_SHAPE:
        axes = list(cfg.TPU.MESH_AXES)
        if "data" in axes:
            return int(cfg.TPU.MESH_SHAPE[axes.index("data")])
    if cfg.TPU.SHARD_STRATEGY == "dp_sp" and n % 2 == 0:
        return n // 2
    return n


def param_sharding(mesh, x):
    """FSDP-style (ZeRO-3) sharding rule: shard the largest axis of big
    parameters over 'data'; small tensors stay replicated. GSPMD turns the
    per-use all-gathers + grad reduce-scatters into ICI collectives."""
    if x.ndim == 0 or x.size < (1 << 16):
        return NamedSharding(mesh, P())
    sizes = list(x.shape)
    ax = int(np.argmax(sizes))
    if sizes[ax] % mesh.shape["data"] != 0:
        return NamedSharding(mesh, P())
    spec = [None] * x.ndim
    spec[ax] = "data"
    return NamedSharding(mesh, P(*spec))


def shard_batch(batch, mesh, sequence_parallel=True):
    """Device_put a host batch pytree with batch-axis sharding (+ temporal
    sequence sharding for rank-5 video tensors on a (data, model) mesh)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x,
            batch_sharding(
                mesh, np.ndim(x) if sequence_parallel else None
            ),
        ),
        batch,
    )


def replicate(tree, mesh, strategy="dp"):
    """Place train state on the mesh: replicated ('dp'/'dp_sp') or
    parameter-sharded ('fsdp')."""
    if strategy == "fsdp":
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, param_sharding(mesh, x)), tree
        )
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
