"""Diffusion image-generation engine (ref python/sglang/multimodal_gen).

The reference ships a full diffusion serving stack (DiTs, VAEs, text
encoders, flow/DDIM schedulers, staged pipelines, an OpenAI images API).
This package is its TPU-native core:

- models in the same functional param-spec style as the LLM zoo
  (dit.py, vae.py, clip_text.py);
- the denoising loop is ONE jitted lax.scan over a static step count —
  the TPU-shaped replacement for the reference's per-step python loop +
  CUDA-graph wrappers (runtime/pipelines_core/);
- request batching by (size, steps) bucket in engine.py, OpenAI
  /v1/images/generations in http_server.py.
"""

from sglang_tpu.diffusion.engine import DiffGenerator  # noqa: F401
