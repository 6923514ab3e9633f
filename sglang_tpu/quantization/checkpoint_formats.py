"""Pre-quantized checkpoint formats: AWQ / GPTQ / compressed-tensors /
fp8-block loaders.

Ref behavior: srt/layers/quantization/{awq/,gptq/,compressed_tensors/,
fp8.py} + srt/model_loader/loader.py's quant-config plumbing. The
reference keeps weights packed and dequantizes inside CUDA kernels
(awq_dequantize / marlin). The TPU-native recast: unpack ONCE on the
host at load time into dense float weights, then (optionally) requantize
into this runtime's own int8/fp8 storage (--quantization int8/fp8/
w8a8_int8) so serving still streams quantized bytes from HBM — XLA fuses
that dequant into the matmul, which is the part that matters on TPU.
Accuracy exactly matches the checkpoint's quantized values: dequant is
s*(q-z) in float32 with no re-rounding.

Formats (packing layouts are the public AutoAWQ / GPTQ / vLLM
conventions):
- AWQ (quant_method "awq", version gemm): qweight int32 [in, out/8]
  (8 4-bit nibbles per int32 in the interleaved AWQ order), qzeros int32
  [in/g, out/8], scales f16 [in/g, out]. w = (q - z) * s.
- GPTQ (quant_method "gptq"): qweight int32 [in/8, out] (nibbles packed
  along rows, sequential order), qzeros int32 [in/g, out/8] (+1 offset in
  v1 checkpoints), scales [in/g, out], optional g_idx [in] (desc_act).
- compressed-tensors (int schemes): weight int8 [out, in] +
  weight_scale [out, 1] (channel) or scalar (tensor).
- fp8 (block or tensor scales, e.g. DeepSeek-V3/R1 native checkpoints):
  weight f8e4m3 [out, in] + weight_scale_inv [ceil(out/b), ceil(in/b)]
  (block) or weight_scale scalar (tensor).

Stream integration: `dequantize_stream` wraps the checkpoint tensor
iterator, buffers a module's quant tensors until the group is complete,
and emits a single dense `<module>.weight` float32 [out, in] — the same
shape/name the unquantized HF checkpoint would have, so every model's
map_hf_weight works unchanged.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# AutoAWQ packs nibble i of each int32 so that unpacking in shift order
# then permuting each 8-group by AWQ_ORDER restores logical columns.
AWQ_ORDER = [0, 2, 4, 6, 1, 3, 5, 7]


def load_checkpoint_quant_config(model_path: str) -> Optional[dict]:
    """Read config.json's quantization_config if it names a format we
    unpack at load time. Returns a normalized dict or None."""
    cfg_path = os.path.join(model_path, "config.json")
    if not os.path.exists(cfg_path):
        return None
    with open(cfg_path) as f:
        cfg = json.load(f)
    qc = cfg.get("quantization_config")
    if not qc:
        return None
    method = (qc.get("quant_method") or "").lower()
    if method == "awq":
        return {
            "method": "awq",
            "bits": int(qc.get("bits", qc.get("w_bit", 4))),
            "group_size": int(qc.get("group_size", qc.get("q_group_size", 128))),
        }
    if method == "gptq":
        return {
            "method": "gptq",
            "bits": int(qc.get("bits", 4)),
            "group_size": int(qc.get("group_size", 128)),
            "sym": bool(qc.get("sym", True)),
            "desc_act": bool(qc.get("desc_act", False)),
            "v2": (qc.get("checkpoint_format") == "gptq_v2"),
        }
    if method == "compressed-tensors":
        return {"method": "compressed-tensors"}
    if method == "fp8":
        return {
            "method": "fp8",
            "weight_block_size": qc.get("weight_block_size"),
        }
    logger.warning(
        "quantization_config method %r is not a load-time unpack format; "
        "loading tensors as-is", method,
    )
    return None


# ---------------------------------------------------------------- unpack

def _unpack_int32_nibbles(q: np.ndarray, bits: int, axis: int) -> np.ndarray:
    """Split each int32 along `axis` into 32/bits values (shift order)."""
    pack = 32 // bits
    shifts = np.arange(pack, dtype=np.uint32) * bits
    u = q.astype(np.uint32)
    expanded = (u[..., None] >> shifts) & ((1 << bits) - 1)  # [..., pack]
    # Move the nibble dim next to `axis` and merge.
    expanded = np.moveaxis(expanded, -1, axis + 1)
    shape = list(q.shape)
    shape[axis] = shape[axis] * pack
    return expanded.reshape(shape).astype(np.int32)


def _awq_reorder(x: np.ndarray) -> np.ndarray:
    """Undo the AWQ column interleave on the last axis (groups of 8)."""
    n = x.shape[-1]
    idx = np.arange(n).reshape(-1, 8)[:, AWQ_ORDER].reshape(-1)
    return x[..., idx]


def dequant_awq(
    qweight: np.ndarray,  # int32 [in, out/8]
    qzeros: np.ndarray,   # int32 [in/g, out/8]
    scales: np.ndarray,   # [in/g, out]
    bits: int = 4,
) -> np.ndarray:
    """Dense float32 [in, out]."""
    iw = _awq_reorder(_unpack_int32_nibbles(qweight, bits, axis=1))
    iz = _awq_reorder(_unpack_int32_nibbles(qzeros, bits, axis=1))
    g = iw.shape[0] // iz.shape[0]
    z = np.repeat(iz, g, axis=0).astype(np.float32)
    s = np.repeat(scales.astype(np.float32), g, axis=0)
    return (iw.astype(np.float32) - z) * s


def dequant_gptq(
    qweight: np.ndarray,  # int32 [in/pack, out]
    qzeros: np.ndarray,   # int32 [in/g, out/8]
    scales: np.ndarray,   # [in/g, out]
    g_idx: Optional[np.ndarray],  # int32 [in] or None
    bits: int = 4,
    v2: bool = False,
) -> np.ndarray:
    """Dense float32 [in, out]. v1 checkpoints store zeros-1 (the GPTQ
    "+1" convention); v2 stores them directly."""
    iw = _unpack_int32_nibbles(qweight, bits, axis=0)  # [in, out]
    iz = _unpack_int32_nibbles(qzeros, bits, axis=1)   # [in/g, out]
    if not v2:
        iz = iz + 1
    n_in = iw.shape[0]
    if g_idx is not None and g_idx.size == n_in:
        rows = g_idx.astype(np.int64)
    else:
        g = n_in // iz.shape[0]
        rows = np.arange(n_in) // g
    z = iz[rows].astype(np.float32)
    s = scales.astype(np.float32)[rows]
    return (iw.astype(np.float32) - z) * s


def _block_dequant_fp8(
    w: np.ndarray, scale_inv: np.ndarray, block: Tuple[int, int]
) -> np.ndarray:
    bn, bk = block
    out = w.astype(np.float32)
    sn = np.repeat(scale_inv.astype(np.float32), bn, axis=0)[: out.shape[0]]
    sn = np.repeat(sn, bk, axis=1)[:, : out.shape[1]]
    return out * sn


# ---------------------------------------------------------------- stream

_AWQ_PARTS = ("qweight", "qzeros", "scales")
_GPTQ_PARTS = ("qweight", "qzeros", "scales")


def dequantize_stream(
    it: Iterator[Tuple[str, np.ndarray]], qcfg: dict
) -> Iterator[Tuple[str, np.ndarray]]:
    """Group a module's packed tensors and emit dense `<module>.weight`.

    Tensors not belonging to a packed group (norms, embeddings, biases)
    pass through unchanged. Groups are emitted as soon as complete, so
    peak host memory is one module's worth of packed + dense data."""
    method = qcfg["method"]
    pending: Dict[str, Dict[str, np.ndarray]] = {}

    def _try_emit(mod: str):
        parts = pending[mod]
        if method == "awq":
            if all(k in parts for k in _AWQ_PARTS):
                w = dequant_awq(
                    parts["qweight"], parts["qzeros"], parts["scales"],
                    qcfg.get("bits", 4),
                )
                del pending[mod]
                return w.T  # HF linear convention [out, in]
        elif method == "gptq":
            need = _GPTQ_PARTS + (("g_idx",) if qcfg.get("desc_act") else ())
            if all(k in parts for k in need):
                w = dequant_gptq(
                    parts["qweight"], parts["qzeros"], parts["scales"],
                    parts.get("g_idx"), qcfg.get("bits", 4),
                    qcfg.get("v2", False),
                )
                del pending[mod]
                return w.T
        elif method == "compressed-tensors":
            if "weight" in parts and "weight_scale" in parts:
                w = parts["weight"].astype(np.float32)
                s = parts["weight_scale"].astype(np.float32)
                if s.ndim == 0 or s.size == 1:
                    w = w * float(s.reshape(-1)[0])
                else:
                    w = w * s.reshape(-1, 1)
                del pending[mod]
                return w
        elif method == "fp8":
            block = qcfg.get("weight_block_size")
            if block and "weight" in parts and "weight_scale_inv" in parts:
                w = _block_dequant_fp8(
                    parts["weight"], parts["weight_scale_inv"], tuple(block)
                )
                del pending[mod]
                return w
            if not block and "weight" in parts and "weight_scale" in parts:
                w = parts["weight"].astype(np.float32) * float(
                    np.asarray(parts["weight_scale"]).reshape(-1)[0]
                )
                del pending[mod]
                return w
        return None

    quant_suffixes = {
        "awq": ("qweight", "qzeros", "scales", "g_idx", "bias"),
        "gptq": ("qweight", "qzeros", "scales", "g_idx", "bias"),
        "compressed-tensors": ("weight", "weight_scale", "weight_shape",
                               "input_scale", "weight_zero_point"),
        "fp8": ("weight", "weight_scale_inv", "weight_scale", "input_scale"),
    }[method]

    for name, arr in it:
        mod, _, suffix = name.rpartition(".")
        grouped = False
        if suffix in quant_suffixes and mod:
            if method in ("compressed-tensors", "fp8"):
                # Dense float weights (norms/embeddings) are also
                # "<mod>.weight" — only group genuinely quantized dtypes
                # or scale/meta parts.
                if suffix == "weight":
                    is_q = (arr.dtype == np.int8
                            or "float8" in str(arr.dtype))
                    grouped = is_q
                elif suffix in ("input_scale", "weight_zero_point",
                                "weight_shape"):
                    # consumed only for activation quant; drop for now
                    grouped = True
                else:
                    grouped = True
            else:
                grouped = suffix != "bias"
        if grouped:
            pending.setdefault(mod, {})[suffix] = arr
            out = _try_emit(mod)
            if out is not None:
                yield mod + ".weight", out
        else:
            yield name, arr

    # Leftovers: groups that never completed (e.g. fp8 weight with no
    # scale seen yet because file ordering split them) — emit what we
    # can, warn about the rest.
    for mod in list(pending):
        out = _try_emit(mod)
        if out is not None:
            yield mod + ".weight", out
    for mod, parts in pending.items():
        # Scale-only leftovers (input_scale etc.) are expected; real
        # weight leftovers are not.
        if any(k in parts for k in ("qweight", "weight")):
            logger.warning(
                "quantized module %s missing companion tensors %s; skipped",
                mod, sorted(parts),
            )


# ---------------------------------------------------------------- pack
# (test + tooling helpers: exact inverses of the dequant above)

def pack_awq(
    iw: np.ndarray,  # int [in, out] quantized values
    iz: np.ndarray,  # int [in/g, out] zero points
    scales: np.ndarray,  # [in/g, out]
    bits: int = 4,
) -> Dict[str, np.ndarray]:
    inv = np.argsort(np.arange(iw.shape[-1]).reshape(-1, 8)[:, AWQ_ORDER]
                     .reshape(-1))

    def _pack_cols(x):
        x = x[..., inv]
        pack = 32 // bits
        x = x.reshape(x.shape[0], -1, pack).astype(np.uint32)
        shifts = np.arange(pack, dtype=np.uint32) * bits
        # ascontiguousarray: the reduction can come back F-ordered, and
        # safetensors 0.8 serializes the raw buffer assuming C order.
        return np.ascontiguousarray(
            (x << shifts).sum(axis=-1, dtype=np.uint32).astype(np.int32)
        )

    return {
        "qweight": _pack_cols(iw),
        "qzeros": _pack_cols(iz),
        "scales": np.ascontiguousarray(scales.astype(np.float16)),
    }


def pack_gptq(
    iw: np.ndarray, iz: np.ndarray, scales: np.ndarray, bits: int = 4,
    v2: bool = False,
) -> Dict[str, np.ndarray]:
    pack = 32 // bits
    shifts = np.arange(pack, dtype=np.uint32) * bits

    w = iw.astype(np.uint32).reshape(-1, pack, iw.shape[1])
    qweight = (w << shifts[None, :, None]).sum(axis=1, dtype=np.uint32)
    z = iz if v2 else iz - 1
    z = z.astype(np.uint32).reshape(z.shape[0], -1, pack)
    qzeros = (z << shifts).sum(axis=-1, dtype=np.uint32)
    return {
        "qweight": np.ascontiguousarray(qweight.astype(np.int32)),
        "qzeros": np.ascontiguousarray(qzeros.astype(np.int32)),
        "scales": np.ascontiguousarray(scales.astype(np.float16)),
    }
