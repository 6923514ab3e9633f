"""Image processors (from-scratch numpy, HF-numerics-exact).

Ref behavior: srt/multimodal/processors/{base_processor.py,qwen_vl.py,
llava.py} + the HF image processors they wrap. Each processor turns a
PIL image into (pixel arrays, grid metadata, number of LM placeholder
tokens, content hash). The hash keys both the scheduler's ViT-embedding
cache and the radix prefix keys (mm_hashes), so identical images reuse
both the encoder output and the KV cache.
"""

from __future__ import annotations

import base64
import dataclasses
import hashlib
import io
import math
from typing import List, Optional, Tuple

import numpy as np

# CLIP/Qwen2-VL normalization constants (OPENAI_CLIP_MEAN/STD).
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def load_video(data):
    """Video input -> list of PIL frames. Accepted forms (ref
    GenerateReqInput.video_data, srt/managers/io_struct.py:186): a list of
    image-likes (paths/URLs/base64/PIL/np frames), an np array [T, H, W, 3],
    a dict {"frames": [...], "fps": f}, or a .npy/.npz path holding
    [T, H, W, 3] uint8 (container decode is delegated to the client in
    this build — no video codecs ship in the image)."""
    import numpy as _np
    from PIL import Image

    if isinstance(data, dict) and "frames" in data:
        data = data["frames"]
    if isinstance(data, str) and (data.endswith(".npy")
                                  or data.endswith(".npz")):
        arr = _np.load(data)
        if hasattr(arr, "files"):
            arr = arr[arr.files[0]]
        data = arr
    if isinstance(data, _np.ndarray):
        if data.ndim != 4:
            raise ValueError(f"video array must be [T,H,W,3]; got {data.shape}")
        return [Image.fromarray(f.astype(_np.uint8)) for f in data]
    if isinstance(data, (list, tuple)):
        return [f if isinstance(f, Image.Image) else load_image(f)
                for f in data]
    raise ValueError(f"unsupported video_data type {type(data).__name__}")


def load_image(data) -> "PIL.Image.Image":
    """Accepts a PIL image, local path, bytes, base64, or data URI."""
    from PIL import Image

    if hasattr(data, "convert"):  # PIL image
        return data.convert("RGB")
    if isinstance(data, bytes):
        return Image.open(io.BytesIO(data)).convert("RGB")
    if isinstance(data, str):
        if data.startswith("data:"):
            b64 = data.split(",", 1)[1]
            return Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
        if len(data) > 256 or not any(c in data for c in "/\\."):
            # likely raw base64
            try:
                return Image.open(
                    io.BytesIO(base64.b64decode(data))
                ).convert("RGB")
            except Exception:  # noqa: BLE001
                pass
        return Image.open(data).convert("RGB")
    raise ValueError(f"unsupported image payload type {type(data)}")


def _resize(img, size_hw: Tuple[int, int]):
    # Native path (csrc/mm_preproc.cpp): PIL-exact fixed-point
    # resampling off the GIL; byte-identical to the PIL fallback.
    from . import native

    if native.available():
        out = native.resize_u8(
            np.asarray(img, np.uint8), size_hw, native.FILTER_BICUBIC
        )
        if out is not None:
            from PIL import Image

            return Image.fromarray(out)
    from PIL import Image

    # HF resample=3 == PIL BICUBIC.
    return img.resize((size_hw[1], size_hw[0]), Image.BICUBIC)


def _to_chw_norm(img) -> np.ndarray:
    from . import native

    if native.available():
        out = native.normalize_chw(
            np.asarray(img, np.uint8), CLIP_MEAN.ravel(), CLIP_STD.ravel()
        )
        if out is not None:
            return out
    arr = np.asarray(img, np.float32) / 255.0  # [H, W, 3]
    arr = (arr - CLIP_MEAN) / CLIP_STD
    return arr.transpose(2, 0, 1)  # [3, H, W]


def _hash_pixels(arr: np.ndarray) -> int:
    return int.from_bytes(
        hashlib.sha1(np.ascontiguousarray(arr).tobytes()).digest()[:8], "big"
    )


@dataclasses.dataclass
class ProcessedImage:
    pixel_values: np.ndarray  # model-specific layout
    grid_thw: Optional[Tuple[int, int, int]]  # qwen2vl patch grid
    num_tokens: int  # LM placeholder tokens this image expands to
    mm_hash: int


class LlavaImageProcessor:
    """CLIP-style square resize+crop (ref srt/multimodal/processors/llava.py
    + HF CLIPImageProcessor with shortest_edge resize & center crop)."""

    def __init__(self, hf_config):
        vc = hf_config.vision_config
        self.crop = vc.image_size  # e.g. 336
        patches = vc.image_size // vc.patch_size
        # default feature-select drops CLS -> patches^2 tokens
        self.num_tokens = patches * patches

    def __call__(self, img) -> ProcessedImage:
        w, h = img.size
        short = self.crop
        if w <= h:
            new_w, new_h = short, max(int(round(h * short / w)), short)
        else:
            new_h, new_w = short, max(int(round(w * short / h)), short)
        img = _resize(img, (new_h, new_w))
        # center crop to [crop, crop]
        top = (new_h - self.crop) // 2
        left = (new_w - self.crop) // 2
        img = img.crop((left, top, left + self.crop, top + self.crop))
        chw = _to_chw_norm(img)[None]  # [1, 3, S, S]
        return ProcessedImage(
            pixel_values=chw.astype(np.float32),
            grid_thw=None,
            num_tokens=self.num_tokens,
            mm_hash=_hash_pixels(chw),
        )


def qwen2vl_smart_resize(h: int, w: int, factor: int, min_pixels: int,
                         max_pixels: int) -> Tuple[int, int]:
    """HF Qwen2VLImageProcessor.smart_resize (exact)."""
    if max(h, w) / min(h, w) > 200:
        raise ValueError("aspect ratio too extreme")
    h_bar = max(factor, round(h / factor) * factor)
    w_bar = max(factor, round(w / factor) * factor)
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((h * w) / max_pixels)
        h_bar = math.floor(h / beta / factor) * factor
        w_bar = math.floor(w / beta / factor) * factor
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (h * w))
        h_bar = math.ceil(h * beta / factor) * factor
        w_bar = math.ceil(w * beta / factor) * factor
    return h_bar, w_bar


class Qwen2VLImageProcessor:
    """Dynamic-resolution patchify (ref srt/multimodal/processors/qwen_vl.py
    + HF Qwen2VLImageProcessor): smart-resize to multiples of
    patch*merge (28), normalize, then flatten into
    [grid_t*grid_h*grid_w, C*tps*ps*ps] rows in HF's merge-block order."""

    def __init__(self, hf_config):
        vc = hf_config.vision_config
        self.ps = getattr(vc, "patch_size", 14)
        self.merge = getattr(vc, "spatial_merge_size", 2)
        self.tps = getattr(vc, "temporal_patch_size", 2)
        self.min_pixels = 56 * 56
        self.max_pixels = 28 * 28 * 1280

    def __call__(self, img) -> ProcessedImage:
        w, h = img.size
        factor = self.ps * self.merge
        h2, w2 = qwen2vl_smart_resize(h, w, factor, self.min_pixels,
                                      self.max_pixels)
        img = _resize(img, (h2, w2))
        chw = _to_chw_norm(img)  # [3, H, W]
        patches = np.tile(chw[None], (self.tps, 1, 1, 1))  # [tps, 3, H, W]
        ps, m = self.ps, self.merge
        grid_t = 1
        grid_h, grid_w = h2 // ps, w2 // ps
        # HF order: [t, C, gh/m, m, ps, gw/m, m, ps] -> rows grouped by
        # (t, gh/m, gw/m, m, m) with feature (C, tps, ps, ps).
        x = patches.reshape(
            grid_t, self.tps, 3, grid_h // m, m, ps, grid_w // m, m, ps
        )
        x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
        rows = x.reshape(grid_t * grid_h * grid_w, 3 * self.tps * ps * ps)
        num_tokens = grid_t * (grid_h // m) * (grid_w // m)
        return ProcessedImage(
            pixel_values=rows.astype(np.float32),
            grid_thw=(grid_t, grid_h, grid_w),
            num_tokens=num_tokens,
            mm_hash=_hash_pixels(rows),
        )


def _qwen2_audio_processor(hf_config):
    from sglang_tpu.multimodal.audio import Qwen2AudioProcessor

    return Qwen2AudioProcessor(hf_config)


def _whisper_processor(hf_config):
    from sglang_tpu.multimodal.audio import WhisperASRProcessor

    return WhisperASRProcessor(hf_config)


class SquareResizeProcessor:
    """Plain square resize + 0.5/0.5 normalize (HF Gemma3ImageProcessor
    defaults, pan-and-scan off; also SigLIP-style towers in general)."""

    def __init__(self, hf_config):
        vc = hf_config.vision_config
        self.size = vc.image_size
        self.num_tokens = int(getattr(hf_config, "mm_tokens_per_image", 0)) \
            or (vc.image_size // vc.patch_size) ** 2

    def __call__(self, img) -> ProcessedImage:
        img = _resize(img, (self.size, self.size))
        arr = np.asarray(img, np.float32) / 255.0
        arr = (arr - 0.5) / 0.5
        chw = arr.transpose(2, 0, 1)[None]
        return ProcessedImage(
            pixel_values=chw.astype(np.float32),
            grid_thw=None,
            num_tokens=self.num_tokens,
            mm_hash=_hash_pixels(chw),
        )


class InternVLImageProcessor:
    """Single-tile InternVL preprocessing (HF GotOcr2ImageProcessor with
    crop_to_patches off): square resize + CLIP-stats normalize; tokens =
    (grid * downsample_ratio)^2 after the pixel shuffle."""

    def __init__(self, hf_config):
        vc = hf_config.vision_config
        self.size = vc.image_size if isinstance(vc.image_size, int) \
            else vc.image_size[0]
        patch = vc.patch_size if isinstance(vc.patch_size, int) \
            else vc.patch_size[0]
        r = float(getattr(hf_config, "downsample_ratio", 0.5))
        self.num_tokens = int((self.size // patch * r) ** 2)

    def __call__(self, img) -> ProcessedImage:
        img = _resize(img, (self.size, self.size))
        chw = _to_chw_norm(img)[None]
        return ProcessedImage(
            pixel_values=chw.astype(np.float32),
            grid_thw=None,
            num_tokens=self.num_tokens,
            mm_hash=_hash_pixels(chw),
        )


_PROCESSORS = {
    "LlavaForConditionalGeneration": LlavaImageProcessor,
    "Gemma3ForConditionalGeneration": SquareResizeProcessor,
    "InternVLForConditionalGeneration": InternVLImageProcessor,
    "InternVLChatModel": InternVLImageProcessor,
    "Qwen2VLForConditionalGeneration": Qwen2VLImageProcessor,
    # Audio modality (processor.modality == "audio"):
    "Qwen2AudioForConditionalGeneration": _qwen2_audio_processor,
    # Encoder-decoder ASR (processor.encoder_decoder == True):
    "WhisperForConditionalGeneration": _whisper_processor,
}


class Qwen2VLVideoMixin:
    """Video patchify for Qwen2-VL-family processors (ref
    srt/multimodal/processors/qwen_vl.py video path + HF
    Qwen2VLImageProcessor(videos=...)): frames smart-resize like images,
    temporal groups of `temporal_patch_size` frames form grid_t, and rows
    keep HF's merge-block order with the SAME feature layout as images —
    the ViT consumes them unchanged (frame-block-diagonal attention)."""

    def process_video(self, frames) -> ProcessedImage:
        if not frames:
            raise ValueError("empty video")
        w, h = frames[0].size
        factor = self.ps * self.merge
        h2, w2 = qwen2vl_smart_resize(h, w, factor, self.min_pixels,
                                      self.max_pixels)
        chws = [_to_chw_norm(_resize(f, (h2, w2))) for f in frames]
        T = len(chws)
        if T % self.tps:
            chws.extend([chws[-1]] * (self.tps - T % self.tps))
            T = len(chws)
        patches = np.stack(chws)  # [T, 3, H, W]
        ps, m = self.ps, self.merge
        grid_t = T // self.tps
        grid_h, grid_w = h2 // ps, w2 // ps
        x = patches.reshape(
            grid_t, self.tps, 3, grid_h // m, m, ps, grid_w // m, m, ps
        )
        x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
        rows = x.reshape(grid_t * grid_h * grid_w, 3 * self.tps * ps * ps)
        num_tokens = grid_t * (grid_h // m) * (grid_w // m)
        return ProcessedImage(
            pixel_values=rows.astype(np.float32),
            grid_thw=(grid_t, grid_h, grid_w),
            num_tokens=num_tokens,
            mm_hash=_hash_pixels(rows),
        )


Qwen2VLImageProcessor.process_video = Qwen2VLVideoMixin.process_video
Qwen2VLImageProcessor.supports_video = True


def get_mm_processor(architectures, hf_config):
    for arch in architectures:
        if arch in _PROCESSORS:
            return _PROCESSORS[arch](hf_config)
    return None
