"""sglang-tpu: a TPU-native LLM serving framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of SGLang
(reference: sgl-project/sglang): continuous-batching scheduler with
RadixAttention prefix caching over a paged KV cache, ragged paged
attention in Pallas, tensor/expert/data parallelism over ICI meshes via
XLA collectives, OpenAI-compatible serving APIs, structured output,
speculative decoding, and multi-LoRA batching.

Reference layer map: /root/reference SURVEY.md (repo root).
"""

__version__ = "0.1.0"
