"""Device-mesh construction and sharding helpers.

The TPU-native replacement for the reference's GroupCoordinator world
(srt/distributed/parallel_state.py:221,2105,2197 — NCCL process groups per
TP/PP/EP/DP dimension). Here parallelism is expressed as ONE
jax.sharding.Mesh with named axes; XLA GSPMD inserts the collectives
(psum/all_gather/reduce_scatter/all_to_all) over ICI. There is no NCCL
layer, no per-rank process group, and no custom all-reduce kernels —
collectives are XLA-native on TPU.

Axis conventions:
  "dp"  — data parallel (whole-engine replicas share a mesh only for
          DP-attention-style models; plain DP uses separate engines)
  "tp"  — tensor parallel: attention heads / MLP hidden sharded here
  "ep"  — expert parallel for MoE (folded over the same devices as tp)
  "pp"  — pipeline stages
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DP = "dp"
AXIS_TP = "tp"
AXIS_EP = "ep"  # alias axis: EP reuses tp devices via axis renaming in shard_map
AXIS_PP = "pp"


@dataclasses.dataclass
class MeshContext:
    mesh: Mesh
    tp_size: int
    dp_size: int
    pp_size: int
    ep_size: int

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size


_MESH_CONTEXT: Optional[MeshContext] = None


def create_mesh(
    tp_size: int = 1,
    dp_size: int = 1,
    pp_size: int = 1,
    ep_size: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> MeshContext:
    if devices is None:
        devices = jax.devices()
    if ep_size not in (1, tp_size):
        raise ValueError(
            f"ep_size must be 1 or equal to tp_size (EP partitions experts "
            f"over the tp-axis devices); got ep={ep_size} tp={tp_size}"
        )
    need = tp_size * dp_size * pp_size
    if len(devices) < need:
        raise ValueError(
            f"mesh needs {need} devices (tp={tp_size} dp={dp_size} pp={pp_size}), "
            f"got {len(devices)}"
        )
    devs = np.asarray(devices[:need]).reshape(pp_size, dp_size, tp_size)
    mesh = Mesh(devs, (AXIS_PP, AXIS_DP, AXIS_TP))
    return MeshContext(
        mesh=mesh, tp_size=tp_size, dp_size=dp_size, pp_size=pp_size, ep_size=ep_size
    )


def set_mesh_context(ctx: MeshContext) -> None:
    global _MESH_CONTEXT
    _MESH_CONTEXT = ctx


def get_mesh_context() -> MeshContext:
    if _MESH_CONTEXT is None:
        set_mesh_context(create_mesh())
    return _MESH_CONTEXT


def force_cpu_devices(n: int = 8) -> None:
    """For tests: emulate an n-device mesh on CPU (must run before jax init)."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}"
    )
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
