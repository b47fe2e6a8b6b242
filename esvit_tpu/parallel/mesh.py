"""Device mesh + sharding rules.

The reference is data-parallel only (DDP over NCCL, SURVEY.md §2.9;
ref utils.py:442-465). TPU-native equivalent: a 2-D ``(data, model)``
``jax.sharding.Mesh``; batches are sharded over ``data`` and parameters are
replicated, except the DINO-head projection (bottleneck 256 -> out_dim 65536,
the single biggest weight) which is *tensor-parallel* over ``model`` when
``mesh.model > 1``. All collectives (gradient psum, loss centering mean,
TP all-gathers) are inserted by XLA from these shardings and ride ICI.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from esvit_tpu.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(cfg.model, 1)
    data = cfg.data if cfg.data > 0 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _is_head_tp_leaf(path: tuple) -> bool:
    """DINO-head last layer: shard out_dim over the model axis."""
    keys = [getattr(k, "key", str(k)) for k in path]
    return "last_layer" in keys and any(k in ("kernel_v", "scale_g") for k in keys)


def param_sharding(mesh: Mesh, params: Any) -> Any:
    """Sharding pytree for a param tree: replicated, with the DINO-head
    projection tensor-parallel over ``model`` when that axis exists."""
    tp = mesh.shape.get(MODEL_AXIS, 1) > 1

    def leaf_sharding(path, x):
        if tp and _is_head_tp_leaf(path):
            spec = P(None, MODEL_AXIS) if x.ndim == 2 else P(MODEL_AXIS)
            return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def shard_train_state(state, mesh: Mesh):
    """Place a full TrainState on the mesh: student/teacher per
    param_sharding (head TP when enabled), everything else replicated.
    Ensures a uniform device set so jit never sees mixed commitments
    (e.g. after an orbax restore)."""
    p_shard = param_sharding(mesh, state.student)
    rep = replicated(mesh)
    return state._replace(
        step=jax.device_put(state.step, rep),
        student=jax.device_put(state.student, p_shard),
        teacher=jax.device_put(state.teacher, p_shard),
        opt_state=jax.device_put(state.opt_state, rep),
        centers=jax.device_put(state.centers, rep),
        student_state=jax.device_put(state.student_state, rep),
        teacher_state=jax.device_put(state.teacher_state, rep),
    )
