"""Device-mesh construction and sharding helpers.

The reference's distributed layer is torch.distributed + NCCL + DDP
(train...match.py:616-629, 86-87); here the equivalent is SPMD over a
`jax.sharding.Mesh` with named axes:

  * ``data``  — data parallelism (batch sharded; gradient all-reduce is
    compiled in by XLA from the sharding annotations).
  * ``model`` — tensor parallelism for the big BART matmuls (attention heads
    and FFN hidden sharded).

Collectives ride ICI; nothing in this file issues an explicit collective —
XLA inserts them from `NamedSharding` constraints.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vacnic_tpu.core.config import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(), devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp * mp != n:
        raise ValueError(f"mesh {dp}x{mp} does not cover {n} devices")
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Parameter sharding rules (tensor parallelism)
# ---------------------------------------------------------------------------
# Param pytrees are nested dicts; leaves are named by their dict path. TP rules
# below shard the attention/FFN projection matrices over the `model` axis in
# the classic Megatron layout: qkv/fc1 column-parallel (output dim sharded),
# out/fc2 row-parallel (input dim sharded). Everything else is replicated.
# XLA then emits the matching all-reduce/all-gather over ICI.

_COL_PARALLEL = ("q_proj", "k_proj", "v_proj", "fc1", "up")  # output-dim sharded
_ROW_PARALLEL = ("out_proj", "fc2", "down")  # input-dim sharded


def _param_spec(path: tuple[str, ...], leaf, model_axis: str) -> P:
    name = path[-1] if path else ""
    parent = path[-2] if len(path) >= 2 else ""
    if name not in ("kernel", "weight"):
        return P()  # biases, layernorms, embeddings: replicated
    if leaf.ndim != 2:
        return P()
    if any(tag in parent for tag in _COL_PARALLEL):
        return P(None, model_axis)
    if any(tag in parent for tag in _ROW_PARALLEL):
        return P(model_axis, None)
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a param dict under the given mesh."""
    model_axis = mesh.axis_names[1] if len(mesh.axis_names) > 1 else None
    msize = mesh.shape.get(model_axis, 1) if model_axis else 1

    def spec_for(path, leaf):
        if model_axis is None or msize == 1:
            return NamedSharding(mesh, P())
        names = tuple(
            str(p.key) if hasattr(p, "key") else str(getattr(p, "idx", p)) for p in path
        )
        spec = _param_spec(names, leaf, model_axis)
        # Only shard if the dim divides evenly; otherwise replicate.
        for dim, ax in enumerate(spec):
            if ax is not None and leaf.shape[dim] % msize != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_for, params)
