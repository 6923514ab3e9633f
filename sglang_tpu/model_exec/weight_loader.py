"""Weight loading: HF safetensors -> sharded device params.

Ref: srt/model_loader/loader.py (DefaultModelLoader:374, dummy format
:4118). Flow: iterate the checkpoint's tensors, let the model map each HF
name to (param, fusion-slot, transformed array), assemble host-side numpy
buffers, then device_put with each param's NamedSharding (GSPMD shards at
transfer time — on multihost each host only materializes its addressable
shards via jax.make_array_from_callback; single-host path uses device_put).
"""

from __future__ import annotations

import glob
import json
import logging
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding

from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, init_dummy_params
from sglang_tpu.parallel.mesh import MeshContext

logger = logging.getLogger(__name__)


def _iter_checkpoint_tensors(model_path: str):
    """Yield (name, numpy array) from safetensors (preferred) or torch bins."""
    st_files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(f, framework="np") as sf:
                for name in sf.keys():
                    yield name, sf.get_tensor(name)
        return
    bin_files = sorted(glob.glob(os.path.join(model_path, "pytorch_model*.bin")))
    if bin_files:
        import torch

        for f in bin_files:
            sd = torch.load(f, map_location="cpu", weights_only=True)
            for name, t in sd.items():
                yield name, t.float().numpy()
        return
    from sglang_tpu.quantization.gguf import find_gguf_file, iter_hf_tensors

    gguf_path = find_gguf_file(model_path)
    if gguf_path:
        yield from iter_hf_tensors(gguf_path)
        return
    raise FileNotFoundError(f"no checkpoint files under {model_path}")


def _to_numpy(arr) -> np.ndarray:
    a = np.asarray(arr)
    if a.dtype == np.float16 or str(a.dtype) == "bfloat16":
        a = a.astype(np.float32)
    return a


def assemble_host_buffers(
    model, specs: SpecTree, model_path: str
) -> Dict[str, np.ndarray]:
    """Checkpoint tensors -> full float32 host buffers per spec param
    (fusion/expert/stack slots resolved, pre-quantized checkpoints
    dequantized). Shared by load_model_weights and the weight-cache
    daemon (weight_cache/daemon.py)."""
    buffers: Dict[str, np.ndarray] = {}
    tensor_iter = _iter_checkpoint_tensors(model_path)
    from sglang_tpu.quantization.checkpoint_formats import (
        dequantize_stream,
        load_checkpoint_quant_config,
    )

    ckpt_qcfg = load_checkpoint_quant_config(model_path)
    if ckpt_qcfg is not None:
        logger.info(
            "pre-quantized checkpoint (%s): unpacking to dense weights at "
            "load", ckpt_qcfg["method"],
        )
        tensor_iter = dequantize_stream(tensor_iter, ckpt_qcfg)
    for hf_name, tensor in tensor_iter:
        for pname, slot, arr in model.map_hf_weight(hf_name, _to_numpy(tensor)):
            if pname not in specs:
                logger.warning("mapped param %s not in spec tree; skipping", pname)
                continue
            spec = specs[pname]
            if pname not in buffers:
                buffers[pname] = np.empty(spec.shape, dtype=np.float32)
            if slot is None:
                assert arr.shape == spec.shape, (pname, arr.shape, spec.shape)
            # Slot semantics (MoE expert slots, PP layer stacking, fusion
            # slots) live in _write_slot.
            _write_slot(buffers[pname], slot, arr)
    return buffers


def load_model_weights(
    model,
    specs: SpecTree,
    mesh_ctx: MeshContext,
    model_path: str,
    load_format: str = "auto",
    seed: int = 0,
    weight_cache_mode: Optional[str] = None,
) -> Params:
    if load_format == "dummy":
        return init_dummy_params(specs, seed, mesh_ctx)
    if weight_cache_mode:
        from sglang_tpu.weight_cache.shm_loader import load_params_via_cache

        params = load_params_via_cache(
            model, specs, mesh_ctx, model_path, mode=weight_cache_mode
        )
        if params is not None:
            return params
        # daemon absent in client mode: fall through to disk load.

    buffers = assemble_host_buffers(model, specs, model_path)

    params: Params = {}
    missing = []
    for pname, spec in specs.items():
        if pname not in buffers:
            if spec.init_value is not None:
                arr = jnp.asarray(spec.init_value, spec.dtype)
                if mesh_ctx is not None:
                    arr = jax.device_put(
                        arr,
                        jax.sharding.NamedSharding(mesh_ctx.mesh, spec.spec),
                    )
                params[pname] = arr
                continue
            missing.append(pname)
            continue
        from sglang_tpu.layers.base import materialize_param

        buf = buffers.pop(pname)
        if spec.post_load is not None:
            buf = spec.post_load(buf)
        params.update(materialize_param(pname, spec, buf, mesh_ctx))
    if missing:
        raise ValueError(f"missing weights for params: {missing[:8]}... "
                         f"({len(missing)} total)")
    return params


def _write_slot(target: np.ndarray, slot, arr: np.ndarray) -> None:
    if slot is None:
        target[...] = arr
    elif isinstance(slot, tuple):
        kind, e = slot[0], slot[1]
        if kind == "stack":
            # PP-stacked layer params: slot = ("stack", layer_idx,
            # inner_slot) writes into row layer_idx with the inner fusion
            # semantics (parallel/pipeline.py).
            _write_slot(target[e], slot[2], arr)
        elif kind == "expert_gate":
            target[e, :, 0, :] = arr
        elif kind == "expert_up":
            target[e, :, 1, :] = arr
        elif kind == "expert_down":
            target[e] = arr
        else:
            raise ValueError(f"unknown expert slot {kind}")
    elif target.ndim == 3:
        target[:, slot, :] = arr
    elif target.ndim == 2:
        target[slot, :] = arr.reshape(-1)
    else:
        raise ValueError("bad fused target ndim")


def update_params_from_named_tensors(
    model,
    specs: SpecTree,
    mesh_ctx: MeshContext,
    params: Params,
    named_tensors,
) -> Params:
    """In-place partial weight update from (hf_name, array) pairs.

    Ref: /update_weights_from_tensor (srt/model_executor/model_runner.py
    update_weights_from_tensor) — the RL path: a colocated trainer pushes
    updated tensors without touching disk. HF names go through the model's
    map_hf_weight so fused slots (qkv/gate_up/experts) update correctly;
    params not mentioned keep their current values.
    """
    touched: Dict[str, np.ndarray] = {}
    for hf_name, tensor in named_tensors:
        for pname, slot, arr in model.map_hf_weight(hf_name, _to_numpy(tensor)):
            if pname not in specs:
                logger.warning("tensor %s maps to unknown param %s", hf_name,
                               pname)
                continue
            if pname not in touched:
                # start from the current device value (partial slot updates);
                # np.asarray of a device buffer is read-only — copy.
                spec = specs[pname]
                if spec.quant_method:
                    # Dequantize the stored quantized weight back to float
                    # so slot updates compose, then requantize on
                    # materialize.
                    if spec.quant_method == "int4":
                        from sglang_tpu.quantization import unpack_int4

                        qw = unpack_int4(
                            np.asarray(params[pname]), spec.quant_axes[0]
                        ).astype(np.float32)
                    else:
                        qw = np.array(params[pname], dtype=np.float32,
                                      copy=True)
                    scale = np.asarray(params[pname + "/qscale"], np.float32)
                    touched[pname] = qw * np.expand_dims(
                        scale, spec.quant_axes
                    )
                else:
                    touched[pname] = np.array(params[pname], dtype=np.float32,
                                              copy=True)
            _write_slot(touched[pname], slot, arr)
    new_params = dict(params)
    for pname, buf in touched.items():
        from sglang_tpu.layers.base import materialize_param

        spec = specs[pname]
        if spec.post_load is not None:
            # Redundant-expert replication assumes the INITIAL placement;
            # RL weight pushes onto a live-rebalanced layout should reset
            # placements first (matching the reference's expert-location
            # reset before update_weights).
            buf = spec.post_load(buf)
        new_params.update(materialize_param(pname, spec, buf, mesh_ctx))
    return new_params
