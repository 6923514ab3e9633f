"""Functional parameter/layer plumbing.

Models in this framework are pure functions over a FLAT dict of jax.Arrays
(`params["model/layers/0/attn/q_proj"]`), plus a static spec table that
declares each parameter's shape, dtype, and mesh PartitionSpec. This
replaces the reference's torch nn.Module + Column/RowParallelLinear weight
objects (srt/layers/linear.py) with the idiomatic JAX shape: GSPMD
propagates shardings from the parameter NamedShardings; no collective is
written by hand in model code.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

Params = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class ParamSpec:
    shape: Tuple[int, ...]
    dtype: Any
    spec: P = P()
    # Optional per-param initializer used by dummy (random-weight) loading.
    init_scale: float = 0.02
    # Constant initial value for params with NO checkpoint tensor (e.g.
    # the EPLB log2phy placement map): used by both real and dummy loads.
    init_value: Any = None
    # Weight quantization (see sglang_tpu/quantization): when set, the
    # loader materializes this param as the quantized tensor plus a
    # companion "<name>/qscale" float32 (per-channel, reduced over
    # quant_axes). shape/dtype above describe the LOGICAL (unquantized)
    # tensor; checkpoints are assembled in float then quantized.
    quant_method: Any = None  # Optional[str]
    quant_axes: Tuple[int, ...] = (0,)
    # Host-side hook applied to the assembled float buffer before
    # quantization/device_put. Used by EPLB redundant experts: checkpoints
    # carry E logical experts but the physical array holds P = E + R
    # slots; the hook replicates the initial replica rows (layers/moe.py).
    post_load: Any = None  # Optional[Callable[[np.ndarray], np.ndarray]]
    # Per-leading-slice RNG names for stacked params (PP's layers_stacked):
    # dummy init draws each slice with its ORIGINAL per-layer name so a
    # stacked program gets the SAME dummy weights as the unstacked model
    # (required for n-device vs 1-device parity checks).
    dummy_names: Any = None  # Optional[Tuple[str, ...]]


SpecTree = Dict[str, ParamSpec]


def host_materialize(name: str, spec: ParamSpec, arr) -> Dict[str, Tuple[Any, P]]:
    """Host half of materialize_param: assembled float buffer -> final
    STORAGE-dtype numpy entries + their PartitionSpecs (quantized weights
    get a companion "<name>/qscale"). Shared by the in-process loader and
    the weight-cache daemon (weight_cache/daemon.py), which pins exactly
    these arrays in shared memory."""
    import numpy as np

    if spec.quant_method:
        from sglang_tpu.quantization import quantize_np, scale_spec

        qw, scale = quantize_np(
            np.asarray(arr, np.float32), spec.quant_method, spec.quant_axes
        )
        return {
            name: (qw, spec.spec),
            name + "/qscale": (
                scale,
                scale_spec(spec.spec, spec.quant_axes, len(spec.shape)),
            ),
        }
    return {name: (np.asarray(arr).astype(spec.dtype), spec.spec)}


def materialize_param(name: str, spec: ParamSpec, arr, mesh_ctx=None) -> Dict[str, Any]:
    """Turn one assembled float buffer into device param entries,
    quantizing when the spec asks for it."""

    def put(a, pspec):
        if mesh_ctx is not None:
            return jax.device_put(
                a, jax.sharding.NamedSharding(mesh_ctx.mesh, pspec)
            )
        return jnp.asarray(a)

    return {
        k: put(a, pspec)
        for k, (a, pspec) in host_materialize(name, spec, arr).items()
    }


def join(*parts: str) -> str:
    return "/".join(p for p in parts if p)


def init_dummy_params(
    specs: SpecTree, seed: int, mesh_ctx=None
) -> Params:
    """Random weights for --load-format dummy (ref: model_loader/loader.py:4118).

    Deterministic per param name so TP shards agree across hosts.
    """
    def dense_draw(name, shape, init_scale):
        key = jax.random.fold_in(
            jax.random.PRNGKey(seed), hash(name) & 0x7FFFFFFF
        )
        return jax.random.normal(key, shape, jnp.float32) * init_scale

    params: Params = {}
    for name, spec in sorted(specs.items()):
        if spec.init_value is not None:
            arr = jnp.asarray(spec.init_value, spec.dtype)
            if arr.shape != tuple(spec.shape):
                # e.g. a per-layer init_value on a PP-stacked spec
                arr = jnp.broadcast_to(arr, spec.shape)
            if mesh_ctx is not None:
                arr = jax.device_put(
                    arr, jax.sharding.NamedSharding(mesh_ctx.mesh, spec.spec)
                )
            params[name] = arr
            continue
        if spec.quant_method or spec.post_load is not None:
            # Quantization happens host-side (materialize_param): generate
            # the floats with numpy too — np.asarray of a device-generated
            # tensor would DOWNLOAD it (hundreds of MB per param through
            # the tunneled-TPU path; an 8B dummy init stalled for hours).
            import numpy as np

            rng = np.random.default_rng((hash(name) ^ seed) & 0x7FFFFFFF)
            # Full standard_normal over an 8B-param model is ~30 GB of
            # host RNG (minutes per init); dummy weights only need to be
            # non-degenerate, so generate a 1M-value block and tile it.
            n = int(np.prod(spec.shape))
            block = rng.standard_normal(
                min(n, 1 << 20), dtype=np.float32
            ) * spec.init_scale
            if n > block.size:
                reps = -(-n // block.size)
                arr_np = np.tile(block, reps)[:n].reshape(spec.shape)
            else:
                arr_np = block[:n].reshape(spec.shape)
            if spec.post_load is not None:
                arr_np = spec.post_load(arr_np)
            params.update(materialize_param(name, spec, arr_np, mesh_ctx))
            continue
        if spec.dummy_names is not None:
            # Stacked param (PP): draw each slice with its per-layer name
            # so stacked and unstacked programs share dummy weights.
            arr = jnp.stack([
                dense_draw(n, spec.shape[1:], spec.init_scale)
                for n in spec.dummy_names
            ])
        else:
            arr = dense_draw(name, spec.shape, spec.init_scale)
        arr = arr.astype(spec.dtype)
        if mesh_ctx is not None:
            arr = jax.device_put(
                arr, jax.sharding.NamedSharding(mesh_ctx.mesh, spec.spec)
            )
        params[name] = arr
    return params
