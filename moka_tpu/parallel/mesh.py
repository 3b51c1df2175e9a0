"""Device mesh construction + distributed init.

Replaces the reference's torchrun/NCCL/DeepSpeed launch stack
(``VisualText/dist_utils.py``, ``shell/train.sh:3-34`` NCCL env zoo) with
``jax.distributed`` + one ``jax.sharding.Mesh``.  Collectives ride ICI within
a slice; XLA inserts them from sharding annotations — there is no explicit
communication code to tune.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from moka_tpu.core.config import MeshConfig

AXIS_DATA = "data"
AXIS_FSDP = "fsdp"
AXIS_MODEL = "model"
AXES = (AXIS_DATA, AXIS_FSDP, AXIS_MODEL)


def init_distributed() -> None:
    """Multi-host init (no-op on single host).  The reference needs
    NCCL_SOCKET_IFNAME/IB tuning (``shell/train.sh:3-26``); JAX needs one
    call."""
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    try:
        jax.distributed.initialize()
    except Exception:
        pass  # single-process / already initialized


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    """Build a ('data', 'fsdp', 'model') mesh.

    If cfg is None, put all devices on the fsdp axis (ZeRO-3-style default,
    matching the reference's default DeepSpeed recipe)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if cfg is None:
        cfg = MeshConfig(data=1, fsdp=n, model=1)
    if cfg.num_devices != n:
        raise ValueError(
            f"mesh {cfg} wants {cfg.num_devices} devices, have {n}")
    arr = np.asarray(devices).reshape(cfg.data, cfg.fsdp, cfg.model)
    return Mesh(arr, AXES)


def host_local_batch_size(global_batch: int, mesh: Mesh) -> int:
    """Samples this host must feed per step.  Divisibility by the full
    data-parallel device count is only required when the batch dim is
    explicitly device-sharded (``batch_sharding``); the train step feeds
    host-local arrays, so the hard requirement is per-process evenness."""
    world = jax.process_count()
    if global_batch % world:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"host count {world}")
    n_data = mesh.shape[AXIS_DATA] * mesh.shape[AXIS_FSDP]
    if global_batch % n_data:
        import warnings
        warnings.warn(f"global batch {global_batch} not divisible by "
                      f"data-parallel size {n_data}; batch arrays cannot be "
                      f"evenly device-sharded (ok for replicated feeding)",
                      stacklevel=2)
    return global_batch // world


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over both data-parallel axes."""
    return NamedSharding(mesh, P((AXIS_DATA, AXIS_FSDP)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
