"""Multimodal input subsystem: image processors + JAX vision encoders.

Ref: srt/multimodal/processors/ (52 per-model processors behind
BaseMultimodalProcessor) and the rust/sglang-mm fused preprocessing. Our
shape: a small registry of from-scratch numpy processors
(multimodal/processors.py) that match HF image-processor numerics exactly,
plus flax-style functional ViT encoders (vision_clip.py, vision_qwen2vl.py)
that run under jit on TPU, wired into the serving path by
TokenizerManager (prompt expansion) and the scheduler (ViT encode at
admission, embedding-cached by mm_hash).
"""

from sglang_tpu.multimodal.processors import (  # noqa: F401
    get_mm_processor,
    load_image,
)
