"""GGUF checkpoint reading (and a writer for tests/export).

Ref: srt/model_loader/loader.py GGUFModelLoader (load_format="gguf")
— the reference shells out to the `gguf` package; this is a
from-scratch pure-numpy implementation of the GGUF v3 container and
the block-quant codecs the llama.cpp ecosystem actually ships:

  F32 / F16 / BF16     passthrough
  Q8_0                 32-elem blocks: f16 scale + 32 x int8
  Q4_0                 32-elem blocks: f16 scale + 16 bytes of nibbles
  Q4_1                 32-elem blocks: f16 scale + f16 min + nibbles

Tensor names follow llama.cpp conventions (token_embd, blk.N.attn_q,
...); `iter_hf_tensors` maps them back to HF names and inverts the
convert_hf_to_gguf.py Q/K head permutation so the loaded weights are
identical to the original HF checkpoint (up to quantization error).
`config_from_gguf` synthesizes an HF-style config dict from the GGUF
metadata so a bare .gguf file serves without a sibling config.json.
"""

from __future__ import annotations

import os
import re
import struct
from typing import Dict, Iterator, Tuple

import numpy as np

GGUF_MAGIC = b"GGUF"
GGUF_VERSION = 3

# metadata value types
T_U8, T_I8, T_U16, T_I16, T_U32, T_I32, T_F32, T_BOOL, T_STR, T_ARR = range(10)
T_U64, T_I64, T_F64 = 10, 11, 12

# ggml tensor types
GGML_F32, GGML_F16 = 0, 1
GGML_Q4_0, GGML_Q4_1 = 2, 3
GGML_Q8_0 = 8
GGML_BF16 = 30

QK = 32  # block size for the _0/_1 quants

_SCALAR_FMT = {
    T_U8: "<B", T_I8: "<b", T_U16: "<H", T_I16: "<h", T_U32: "<I",
    T_I32: "<i", T_F32: "<f", T_BOOL: "<B", T_U64: "<Q", T_I64: "<q",
    T_F64: "<d",
}


# ---------------------------------------------------------------- codecs

def quant_q8_0(a: np.ndarray) -> bytes:
    a = a.reshape(-1, QK).astype(np.float32)
    d = np.abs(a).max(axis=1) / 127.0
    q = np.where(
        d[:, None] > 0, np.round(a / np.where(d[:, None] == 0, 1, d[:, None])), 0
    ).clip(-127, 127).astype(np.int8)
    out = bytearray()
    dv = d.astype(np.float16).view(np.uint16)
    for i in range(a.shape[0]):
        out += struct.pack("<H", int(dv[i])) + q[i].tobytes()
    return bytes(out)


def dequant_q8_0(buf: np.ndarray, n: int) -> np.ndarray:
    blocks = buf.reshape(-1, 2 + QK)
    d = blocks[:, :2].copy().view(np.float16).astype(np.float32)
    q = blocks[:, 2:].view(np.int8).astype(np.float32)
    return (q * d).reshape(-1)[:n]


def quant_q4_0(a: np.ndarray) -> bytes:
    a = a.reshape(-1, QK).astype(np.float32)
    # llama.cpp picks the max-|x| element's VALUE (signed) / -8 as d.
    amax_idx = np.abs(a).argmax(axis=1)
    mval = a[np.arange(a.shape[0]), amax_idx]
    d = mval / -8.0
    inv = np.where(d != 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.clip(a * inv[:, None] + 8.5, 0, 15).astype(np.uint8)
    out = bytearray()
    dv = d.astype(np.float16).view(np.uint16)
    half = QK // 2
    for i in range(a.shape[0]):
        packed = (q[i, :half] | (q[i, half:] << 4)).astype(np.uint8)
        out += struct.pack("<H", int(dv[i])) + packed.tobytes()
    return bytes(out)


def dequant_q4_0(buf: np.ndarray, n: int) -> np.ndarray:
    blocks = buf.reshape(-1, 2 + QK // 2)
    d = blocks[:, :2].copy().view(np.float16).astype(np.float32)
    qs = blocks[:, 2:]
    lo = (qs & 0x0F).astype(np.float32) - 8.0
    hi = (qs >> 4).astype(np.float32) - 8.0
    vals = np.concatenate([lo, hi], axis=1) * d
    return vals.reshape(-1)[:n]


def quant_q4_1(a: np.ndarray) -> bytes:
    a = a.reshape(-1, QK).astype(np.float32)
    mn = a.min(axis=1)
    mx = a.max(axis=1)
    d = (mx - mn) / 15.0
    inv = np.where(d != 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.clip((a - mn[:, None]) * inv[:, None] + 0.5, 0, 15).astype(np.uint8)
    out = bytearray()
    dv = d.astype(np.float16).view(np.uint16)
    mv = mn.astype(np.float16).view(np.uint16)
    half = QK // 2
    for i in range(a.shape[0]):
        packed = (q[i, :half] | (q[i, half:] << 4)).astype(np.uint8)
        out += struct.pack("<HH", int(dv[i]), int(mv[i])) + packed.tobytes()
    return bytes(out)


def dequant_q4_1(buf: np.ndarray, n: int) -> np.ndarray:
    blocks = buf.reshape(-1, 4 + QK // 2)
    d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32)
    m = blocks[:, 2:4].copy().view(np.float16).astype(np.float32)
    qs = blocks[:, 4:]
    lo = (qs & 0x0F).astype(np.float32)
    hi = (qs >> 4).astype(np.float32)
    vals = np.concatenate([lo, hi], axis=1) * d + m
    return vals.reshape(-1)[:n]


def _type_size_bytes(ggml_type: int, n_elems: int) -> int:
    if ggml_type == GGML_F32:
        return 4 * n_elems
    if ggml_type in (GGML_F16, GGML_BF16):
        return 2 * n_elems
    nb = n_elems // QK
    if ggml_type == GGML_Q8_0:
        return nb * (2 + QK)
    if ggml_type == GGML_Q4_0:
        return nb * (2 + QK // 2)
    if ggml_type == GGML_Q4_1:
        return nb * (4 + QK // 2)
    raise ValueError(f"unsupported ggml type {ggml_type}")


def _decode_tensor(ggml_type: int, raw: np.ndarray, shape) -> np.ndarray:
    n = int(np.prod(shape))
    if ggml_type == GGML_F32:
        a = raw.view(np.float32)[:n]
    elif ggml_type == GGML_F16:
        a = raw.view(np.float16)[:n].astype(np.float32)
    elif ggml_type == GGML_BF16:
        a = (raw.view(np.uint16)[:n].astype(np.uint32) << 16).view(
            np.float32
        )
    elif ggml_type == GGML_Q8_0:
        a = dequant_q8_0(raw, n)
    elif ggml_type == GGML_Q4_0:
        a = dequant_q4_0(raw, n)
    elif ggml_type == GGML_Q4_1:
        a = dequant_q4_1(raw, n)
    else:
        raise ValueError(f"unsupported ggml type {ggml_type}")
    return np.ascontiguousarray(a.reshape(shape))


# ---------------------------------------------------------------- writer

def _w_str(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<Q", len(b)) + b


def _w_value(v) -> bytes:
    if isinstance(v, bool):
        return struct.pack("<I", T_BOOL) + struct.pack("<B", int(v))
    if isinstance(v, int):
        return struct.pack("<I", T_U32 if 0 <= v < 2**32 else T_I64) + (
            struct.pack("<I", v) if 0 <= v < 2**32 else struct.pack("<q", v)
        )
    if isinstance(v, float):
        return struct.pack("<I", T_F32) + struct.pack("<f", v)
    if isinstance(v, str):
        return struct.pack("<I", T_STR) + _w_str(v)
    if isinstance(v, (list, tuple)):
        if all(isinstance(x, int) for x in v):
            body = b"".join(struct.pack("<i", x) for x in v)
            return struct.pack("<II", T_ARR, T_I32) + struct.pack(
                "<Q", len(v)
            ) + body
        body = b"".join(_w_str(str(x)) for x in v)
        return struct.pack("<II", T_ARR, T_STR) + struct.pack(
            "<Q", len(v)
        ) + body
    raise TypeError(f"unsupported metadata value {type(v)}")


def write_gguf(
    path: str,
    metadata: Dict[str, object],
    tensors: Dict[str, Tuple[np.ndarray, int]],
    alignment: int = 32,
) -> None:
    """Write a GGUF v3 file. tensors: name -> (array, ggml_type)."""
    meta = dict(metadata)
    meta.setdefault("general.alignment", alignment)
    blobs = {}
    for name, (arr, gt) in tensors.items():
        arr = np.asarray(arr, np.float32)
        if gt == GGML_F32:
            blobs[name] = arr.astype("<f4").tobytes()
        elif gt == GGML_F16:
            blobs[name] = arr.astype("<f2").tobytes()
        elif gt == GGML_BF16:
            u = arr.view(np.uint32)
            # round-to-nearest-even truncation to the top 16 bits
            r = (u + 0x7FFF + ((u >> 16) & 1)) >> 16
            blobs[name] = r.astype("<u2").tobytes()
        elif gt == GGML_Q8_0:
            blobs[name] = quant_q8_0(arr)
        elif gt == GGML_Q4_0:
            blobs[name] = quant_q4_0(arr)
        elif gt == GGML_Q4_1:
            blobs[name] = quant_q4_1(arr)
        else:
            raise ValueError(f"unsupported ggml type {gt}")
    with open(path, "wb") as f:
        f.write(GGUF_MAGIC)
        f.write(struct.pack("<IQQ", GGUF_VERSION, len(tensors), len(meta)))
        for k, v in meta.items():
            f.write(_w_str(k))
            f.write(_w_value(v))
        offset = 0
        for name, (arr, gt) in tensors.items():
            # dims are stored innermost-first (reverse of numpy order)
            dims = list(np.asarray(arr).shape[::-1])
            f.write(_w_str(name))
            f.write(struct.pack("<I", len(dims)))
            for d in dims:
                f.write(struct.pack("<Q", d))
            f.write(struct.pack("<IQ", gt, offset))
            size = len(blobs[name])
            offset += (size + alignment - 1) // alignment * alignment
        # pad to alignment, then the data section
        pos = f.tell()
        f.write(b"\x00" * ((-pos) % alignment))
        for name in tensors:
            b = blobs[name]
            f.write(b)
            f.write(b"\x00" * ((-len(b)) % alignment))


# ---------------------------------------------------------------- reader

class GGUFFile:
    def __init__(self, path: str):
        self.path = path
        self.metadata: Dict[str, object] = {}
        self.tensors: Dict[str, Tuple[list, int, int]] = {}  # shape,type,off
        self._parse()

    def _parse(self):
        with open(self.path, "rb") as f:
            data = f.read()
        mv = memoryview(data)
        if bytes(mv[:4]) != GGUF_MAGIC:
            raise ValueError(f"{self.path}: not a GGUF file")
        version, n_tensors, n_kv = struct.unpack_from("<IQQ", mv, 4)
        if version not in (2, 3):
            raise ValueError(f"unsupported GGUF version {version}")
        pos = 24

        def r_str():
            nonlocal pos
            (n,) = struct.unpack_from("<Q", mv, pos)
            pos += 8
            s = bytes(mv[pos:pos + n]).decode()
            pos += n
            return s

        def r_scalar(t):
            nonlocal pos
            fmt = _SCALAR_FMT[t]
            (v,) = struct.unpack_from(fmt, mv, pos)
            pos += struct.calcsize(fmt)
            return bool(v) if t == T_BOOL else v

        def r_value(t):
            nonlocal pos
            if t == T_STR:
                return r_str()
            if t == T_ARR:
                (et,) = struct.unpack_from("<I", mv, pos)
                pos += 4
                (n,) = struct.unpack_from("<Q", mv, pos)
                pos += 8
                return [r_value(et) for _ in range(n)]
            return r_scalar(t)

        for _ in range(n_kv):
            key = r_str()
            (t,) = struct.unpack_from("<I", mv, pos)
            pos += 4
            self.metadata[key] = r_value(t)
        infos = []
        for _ in range(n_tensors):
            name = r_str()
            (nd,) = struct.unpack_from("<I", mv, pos)
            pos += 4
            dims = list(struct.unpack_from("<" + "Q" * nd, mv, pos))
            pos += 8 * nd
            gt, off = struct.unpack_from("<IQ", mv, pos)
            pos += 12
            # GGUF dims are innermost-first; numpy wants outermost-first.
            infos.append((name, dims[::-1], gt, off))
        align = int(self.metadata.get("general.alignment", 32))
        data_start = (pos + align - 1) // align * align
        self._data = np.frombuffer(data, dtype=np.uint8)
        for name, shape, gt, off in infos:
            self.tensors[name] = (shape, gt, data_start + off)

    def get(self, name: str) -> np.ndarray:
        shape, gt, off = self.tensors[name]
        size = _type_size_bytes(gt, int(np.prod(shape)))
        return _decode_tensor(gt, self._data[off:off + size], shape)

    def items(self) -> Iterator[Tuple[str, np.ndarray]]:
        for name in self.tensors:
            yield name, self.get(name)


# ------------------------------------------------- llama.cpp -> HF names

_DIRECT = {
    "token_embd.weight": "model.embed_tokens.weight",
    "output_norm.weight": "model.norm.weight",
    "output.weight": "lm_head.weight",
}
_BLK = {
    "attn_norm.weight": "input_layernorm.weight",
    "ffn_norm.weight": "post_attention_layernorm.weight",
    "attn_q.weight": "self_attn.q_proj.weight",
    "attn_k.weight": "self_attn.k_proj.weight",
    "attn_v.weight": "self_attn.v_proj.weight",
    "attn_output.weight": "self_attn.o_proj.weight",
    "ffn_gate.weight": "mlp.gate_proj.weight",
    "ffn_up.weight": "mlp.up_proj.weight",
    "ffn_down.weight": "mlp.down_proj.weight",
    "attn_q.bias": "self_attn.q_proj.bias",
    "attn_k.bias": "self_attn.k_proj.bias",
    "attn_v.bias": "self_attn.v_proj.bias",
}


def gguf_to_hf_name(name: str):
    if name in _DIRECT:
        return _DIRECT[name]
    if name.startswith("blk."):
        _, idx, rest = name.split(".", 2)
        hf = _BLK.get(rest)
        if hf is not None:
            return f"model.layers.{idx}.{hf}"
    return None


def _unpermute_qk(w: np.ndarray, n_head: int) -> np.ndarray:
    """Invert convert_hf_to_gguf.py's permute(): GGUF stores llama Q/K
    rows reordered for llama.cpp's interleaved rotary; HF wants
    half-split rotary order."""
    rows = w.shape[0]
    d = rows // n_head
    return (
        w.reshape(n_head, d // 2, 2, *w.shape[1:])
        .swapaxes(1, 2)
        .reshape(w.shape)
    )


def iter_hf_tensors(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (hf_name, f32 array) from a GGUF file, un-permuting llama
    Q/K projections. Unmapped (tokenizer/vision/etc.) tensors are
    skipped — the model's map_hf_weight would not know them anyway."""
    gf = GGUFFile(path)
    arch = gf.metadata.get("general.architecture", "llama")
    n_head = int(gf.metadata.get(f"{arch}.attention.head_count", 0))
    n_kv = int(gf.metadata.get(f"{arch}.attention.head_count_kv", n_head))
    for name, arr in gf.items():
        hf = gguf_to_hf_name(name)
        if hf is None:
            continue
        if arch in ("llama", "mistral") and n_head:
            if hf.endswith("q_proj.weight"):
                arr = _unpermute_qk(arr, n_head)
            elif hf.endswith("k_proj.weight"):
                arr = _unpermute_qk(arr, n_kv)
        yield hf, arr


def find_gguf_file(model_path: str):
    if model_path.endswith(".gguf") and os.path.isfile(model_path):
        return model_path
    if os.path.isdir(model_path):
        import glob as _glob

        files = sorted(_glob.glob(os.path.join(model_path, "*.gguf")))
        if files:
            # Sharded checkpoints (model-00001-of-00003.gguf) would load a
            # single shard silently — refuse rather than yield a partial
            # model (ref srt/model_loader/loader.py GGUF path is also
            # single-file).
            if re.search(r"-\d{5}-of-\d{5}\.gguf$", files[0]):
                raise ValueError(
                    f"sharded GGUF checkpoints are unsupported: {files[0]} "
                    "(merge shards with llama.cpp's gguf-split --merge)"
                )
            return files[0]
    return None


def config_from_gguf(path: str) -> Dict[str, object]:
    """Synthesize an HF-style config dict from GGUF metadata (bare
    .gguf files ship no config.json). Llama-family keys only."""
    gf = GGUFFile(path)
    md = gf.metadata
    arch = md.get("general.architecture", "llama")

    def g(key, default=None):
        return md.get(f"{arch}.{key}", default)

    n_head = int(g("attention.head_count", 32))
    hidden = int(g("embedding_length", 4096))
    vocab = None
    if "token_embd.weight" in gf.tensors:
        vocab = int(gf.tensors["token_embd.weight"][0][0])
    if vocab is None:
        toks = md.get("tokenizer.ggml.tokens")
        vocab = len(toks) if toks else 32000
    return {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": vocab,
        "hidden_size": hidden,
        "num_hidden_layers": int(g("block_count", 32)),
        "num_attention_heads": n_head,
        "num_key_value_heads": int(g("attention.head_count_kv", n_head)),
        "intermediate_size": int(g("feed_forward_length", 4 * hidden)),
        "max_position_embeddings": int(g("context_length", 4096)),
        "rms_norm_eps": float(g("attention.layer_norm_rms_epsilon", 1e-5)),
        "rope_theta": float(g("rope.freq_base", 10000.0)),
        "tie_word_embeddings": "output.weight" not in gf.tensors,
    }
