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
    if "mxfp4" in method:
        # gpt-oss native format (ref srt/layers/quantization/mxfp4.py:244):
        # e2m1 nibble pairs in uint8 `*_blocks` + ue8m0 `*_scales`, g32.
        return {"method": "mxfp4"}
    if "modelopt" in method:
        algo = (qc.get("quant_algo") or
                ("FP4" if "fp4" in method else "FP8")).upper()
        return {"method": "modelopt", "algo": algo}
    if method == "bitsandbytes":
        if not qc.get("load_in_4bit", True):
            logger.warning("bitsandbytes 8-bit checkpoints unsupported; "
                           "loading tensors as-is")
            return None
        return {
            "method": "bitsandbytes",
            "quant_type": qc.get("bnb_4bit_quant_type", "nf4"),
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


# FP4 e2m1 value table, sign bit = nibble MSB (OCP MX spec; ref
# srt/layers/quantization/mxfp4.py dequant_mxfp4).
FP4_E2M1 = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], np.float32)
FP4_LUT = np.concatenate([FP4_E2M1, -FP4_E2M1])

# Standard NF4 codebook (fallback when a bnb checkpoint omits quant_map).
NF4_CODE = np.array(
    [-1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
     -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
     0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
     0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
     0.7229568362236023, 1.0], np.float32)


def _unpack_fp4_low_first(packed: np.ndarray) -> np.ndarray:
    """uint8 [..., B] -> float32 [..., 2B]; element 2j = low nibble of
    byte j (OCP MX / NVFP4 packing)."""
    lo = (packed & 0xF).astype(np.int64)
    hi = (packed >> 4).astype(np.int64)
    pair = np.stack([lo, hi], axis=-1)
    return FP4_LUT[pair.reshape(*packed.shape[:-1], packed.shape[-1] * 2)]


def dequant_mxfp4(blocks: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """MXFP4 (gpt-oss native; ref mxfp4.py:244): blocks uint8
    [..., G, 16] (32 e2m1 values per group), scales uint8 [..., G]
    (UE8M0 biased exponents, 127 = 1.0). Returns float32 [..., G*32]."""
    vals = _unpack_fp4_low_first(blocks)  # [..., G, 32]
    scale = np.exp2(scales.astype(np.float32) - 127.0)
    out = vals * scale[..., None]
    return out.reshape(*blocks.shape[:-2], blocks.shape[-2] * 32)


def dequant_nvfp4(
    weight: np.ndarray,  # uint8 [out, in/2] packed e2m1
    weight_scale: np.ndarray,  # f8e4m3 [out, in/16] per-16-group scales
    weight_scale_2: np.ndarray,  # f32 scalar (global)
) -> np.ndarray:
    """ModelOpt NVFP4 (ref modelopt_quant.py ModelOptFp4Config): w =
    e2m1 * f32(group_scale) * global_scale. Returns float32 [out, in]."""
    vals = _unpack_fp4_low_first(weight)  # [out, in]
    gs = weight_scale.astype(np.float32)  # [out, in/16]
    gs = np.repeat(gs, 16, axis=1)[:, : vals.shape[1]]
    g2 = float(np.asarray(weight_scale_2, np.float32).reshape(-1)[0])
    return vals * gs * g2


def dequant_bnb4(
    packed: np.ndarray,  # uint8 [N/2] or [N/2, 1] (bnb flattens)
    absmax: np.ndarray,  # f32 [N/bs] or uint8 (double-quantized)
    quant_map: Optional[np.ndarray],  # f32[16] codebook (nf4/fp4)
    shape: Tuple[int, ...],
    blocksize: int = 64,
    nested: Optional[dict] = None,  # {absmax, quant_map, offset, blocksize}
) -> np.ndarray:
    """BitsAndBytes 4-bit (ref model_loader/loader.py:2522
    BitsAndBytesModelLoader): packed HIGH-nibble-first codebook indices,
    blockwise absmax, optional double quantization of the absmax."""
    code = (np.asarray(quant_map, np.float32)
            if quant_map is not None else NF4_CODE)
    q = packed.reshape(-1)
    idx = np.stack([(q >> 4), (q & 0xF)], axis=-1).reshape(-1).astype(np.int64)
    vals = code[idx]
    amax = np.asarray(absmax)
    if nested is not None:
        nmap = np.asarray(nested["quant_map"], np.float32)
        namax = np.asarray(nested["absmax"], np.float32)
        nbs = int(nested.get("blocksize", 256))
        offset = float(nested.get("offset", 0.0))
        reals = nmap[amax.astype(np.int64).reshape(-1)]
        namax_rep = np.repeat(namax, nbs)[: reals.size]
        amax = reals * namax_rep + offset
    amax = amax.astype(np.float32).reshape(-1)
    n = int(np.prod(shape))
    nb = (n + blocksize - 1) // blocksize
    v = np.zeros(nb * blocksize, np.float32)
    v[: min(vals.size, v.size)] = vals[: v.size]
    v = v.reshape(nb, blocksize) * amax[:nb, None]
    return v.reshape(-1)[:n].reshape(shape)


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

    if method == "mxfp4":
        yield from _mxfp4_stream(it)
        return
    if method == "bitsandbytes":
        yield from _bnb_stream(it)
        return

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
        elif method == "modelopt":
            algo = qcfg.get("algo", "FP8")
            if "FP4" in algo:
                if all(k in parts for k in
                       ("weight", "weight_scale", "weight_scale_2")):
                    w = dequant_nvfp4(
                        parts["weight"], parts["weight_scale"],
                        parts["weight_scale_2"],
                    )
                    del pending[mod]
                    return w
            else:  # FP8 per-tensor
                if "weight" in parts and "weight_scale" in parts:
                    w = parts["weight"].astype(np.float32) * float(
                        np.asarray(parts["weight_scale"],
                                   np.float32).reshape(-1)[0]
                    )
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
        "modelopt": ("weight", "weight_scale", "weight_scale_2",
                     "input_scale"),
    }[method]

    for name, arr in it:
        mod, _, suffix = name.rpartition(".")
        grouped = False
        if suffix in quant_suffixes and mod:
            if method in ("compressed-tensors", "fp8", "modelopt"):
                # Dense float weights (norms/embeddings) are also
                # "<mod>.weight" — only group genuinely quantized dtypes
                # or scale/meta parts.
                if suffix == "weight":
                    is_q = (arr.dtype == np.int8
                            or arr.dtype == np.uint8  # packed nvfp4
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


def _mxfp4_stream(it):
    """mxfp4 grouping: `<base>_blocks`/`<base>_scales` (HF gpt-oss names)
    or `<base>.blocks`/`.scales` (openai layout) pairs -> dense `<base>`.
    3D+ tensors (per-expert stacks) are swapped back to the HF dense
    convention (contraction dim before output dim — gpt-oss experts'
    gate_up_proj is [E, H, 2I] dense but [E, 2I, H/32, 16] packed)."""
    pending: Dict[str, Dict[str, np.ndarray]] = {}

    def _split(name: str):
        for sep in ("_", "."):
            for part in ("blocks", "scales"):
                suf = sep + part
                if name.endswith(suf):
                    return name[: -len(suf)], part
        return None, None

    for name, arr in it:
        base, part = _split(name)
        if base is None:
            yield name, arr
            continue
        pending.setdefault(base, {})[part] = arr
        parts = pending[base]
        if "blocks" in parts and "scales" in parts:
            w = dequant_mxfp4(parts["blocks"], parts["scales"])
            if w.ndim >= 3:
                w = np.swapaxes(w, -1, -2)
            del pending[base]
            yield base, np.ascontiguousarray(w)
    for base, parts in pending.items():
        logger.warning("mxfp4 module %s missing companion tensors %s",
                       base, sorted(parts))


_BNB_PARTS = ("absmax", "quant_map", "nested_absmax", "nested_quant_map")


def _bnb_stream(it):
    """BitsAndBytes 4-bit grouping (ref model_loader/loader.py:2522):
    `<mod>.weight` uint8 packed + `.weight.absmax/quant_map/...` siblings
    + the serialized `.weight.quant_state.bitsandbytes__{nf4,fp4}` JSON
    blob (shape/blocksize/nesting) -> dense `<mod>.weight`."""
    import json as _json

    pending: Dict[str, Dict[str, np.ndarray]] = {}

    def _emit(key: str):
        parts = pending[key]
        if "packed" not in parts or "state" not in parts:
            return None
        state = _json.loads(
            bytes(bytearray(
                np.asarray(parts["state"], np.uint8).reshape(-1)
            )).decode("utf-8")
        )
        nested = "nested_blocksize" in state or "nested_offset" in state
        if "absmax" not in parts:
            return None
        if nested and not ("nested_absmax" in parts
                           and "nested_quant_map" in parts):
            return None
        w = dequant_bnb4(
            parts["packed"],
            parts["absmax"],
            parts.get("quant_map"),
            tuple(state["shape"]),
            blocksize=int(state.get("blocksize", 64)),
            nested={
                "absmax": parts["nested_absmax"],
                "quant_map": parts["nested_quant_map"],
                "offset": state.get("nested_offset", 0.0),
                "blocksize": state.get("nested_blocksize", 256),
            } if nested else None,
        )
        del pending[key]
        return w

    for name, arr in it:
        key = part = None
        if name.endswith(".weight") and arr.dtype == np.uint8:
            key, part = name, "packed"
        else:
            for suf in _BNB_PARTS:
                if name.endswith(".weight." + suf):
                    key, part = name[: -(len(suf) + 1)], suf
                    break
            else:
                for qt in ("nf4", "fp4"):
                    suf = f".quant_state.bitsandbytes__{qt}"
                    if name.endswith(suf):
                        key, part = name[: -len(suf)], "state"
                        break
        if key is None:
            yield name, arr
            continue
        pending.setdefault(key, {})[part] = arr
        w = _emit(key)
        if w is not None:
            yield key, w
    for key in list(pending):
        w = _emit(key)
        if w is not None:
            yield key, w
    for key, parts in pending.items():
        if "packed" in parts:
            logger.warning("bnb module %s missing companion tensors %s",
                           key, sorted(parts))


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


def _pack_fp4_low_first(codes: np.ndarray) -> np.ndarray:
    """int [..., 2B] FP4_LUT indices -> uint8 [..., B], low nibble first."""
    c = codes.astype(np.uint8).reshape(*codes.shape[:-1], -1, 2)
    return (c[..., 0] | (c[..., 1] << 4)).astype(np.uint8)


def pack_mxfp4(codes: np.ndarray, exps: np.ndarray) -> Dict[str, np.ndarray]:
    """codes int [..., G, 32] (FP4_LUT indices), exps int [..., G]
    (unbiased power-of-2 exponents) -> {blocks, scales} as serialized."""
    blocks = _pack_fp4_low_first(codes)
    return {
        "blocks": np.ascontiguousarray(blocks),
        "scales": np.ascontiguousarray((exps + 127).astype(np.uint8)),
    }


def quantize_mxfp4(w: np.ndarray) -> Dict[str, np.ndarray]:
    """Float [..., K] (K % 32 == 0) -> serialized mxfp4 tensors, nearest
    e2m1 rounding with per-32-group power-of-2 shared scales."""
    g = w.reshape(*w.shape[:-1], -1, 32).astype(np.float32)
    amax = np.abs(g).max(axis=-1)
    exps = np.where(
        amax > 0, np.ceil(np.log2(np.maximum(amax, 1e-30) / 6.0)), 0.0
    ).astype(np.int32)
    scaled = g / np.exp2(exps)[..., None]
    codes = np.abs(scaled[..., None] - FP4_LUT).argmin(axis=-1)
    return pack_mxfp4(codes, exps)


def pack_nvfp4(
    codes: np.ndarray,  # int [out, in] FP4_LUT indices
    group_scales: np.ndarray,  # f32 [out, in/16] (stored as f8e4m3)
    global_scale: float,
) -> Dict[str, np.ndarray]:
    import ml_dtypes

    return {
        "weight": np.ascontiguousarray(_pack_fp4_low_first(codes)),
        "weight_scale": np.ascontiguousarray(
            group_scales.astype(ml_dtypes.float8_e4m3fn)
        ),
        "weight_scale_2": np.float32(global_scale),
    }


def pack_bnb4(
    idx: np.ndarray,  # int [n] codebook indices (flattened weight)
    absmax: np.ndarray,  # f32 [ceil(n/blocksize)]
    shape,
    blocksize: int = 64,
    quant_type: str = "nf4",
    quant_map: Optional[np.ndarray] = None,
    nested: bool = False,
    nested_blocksize: int = 256,
) -> Dict[str, np.ndarray]:
    """Serialize a bitsandbytes 4-bit module the way HF saves it: packed
    bytes (HIGH nibble first), absmax (optionally double-quantized), the
    codebook, and the JSON quant_state blob."""
    import json as _json

    n = int(np.prod(shape))
    pad = (-n) % 2
    flat = np.concatenate([idx.reshape(-1), np.zeros(pad, np.int64)])
    packed = ((flat[0::2].astype(np.uint8) << 4)
              | flat[1::2].astype(np.uint8))
    code = quant_map if quant_map is not None else NF4_CODE
    state = {
        "quant_type": quant_type,
        "blocksize": blocksize,
        "dtype": "bfloat16",
        "shape": list(shape),
    }
    out = {
        "weight": packed.reshape(-1, 1),
        "weight.quant_map": np.asarray(code, np.float32),
    }
    if nested:
        # Double quantization: absmax stored as uint8 indices into a
        # 256-entry codebook with its own blockwise absmax + offset.
        offset = float(absmax.mean())
        centered = absmax - offset
        nb = (absmax.size + nested_blocksize - 1) // nested_blocksize
        padded = np.zeros(nb * nested_blocksize, np.float32)
        padded[: absmax.size] = centered
        namax = np.abs(padded.reshape(nb, -1)).max(axis=1)
        namax = np.maximum(namax, 1e-12)
        norm = padded.reshape(nb, -1) / namax[:, None]
        nmap = np.linspace(-1.0, 1.0, 256).astype(np.float32)
        q8 = np.abs(norm.reshape(-1, 1) - nmap).argmin(axis=1)
        out["weight.absmax"] = q8[: absmax.size].astype(np.uint8)
        out["weight.nested_absmax"] = namax.astype(np.float32)
        out["weight.nested_quant_map"] = nmap
        state["nested_blocksize"] = nested_blocksize
        state["nested_offset"] = offset
        state["nested_dtype"] = "float32"
    else:
        out["weight.absmax"] = absmax.astype(np.float32)
    blob = np.frombuffer(
        _json.dumps(state).encode("utf-8"), dtype=np.uint8
    ).copy()
    out[f"weight.quant_state.bitsandbytes__{quant_type}"] = blob
    return out
