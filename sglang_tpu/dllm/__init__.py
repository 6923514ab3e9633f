"""Diffusion-LLM serving (LLaDA / SDAR block-diffusion class).

Behavioral reference: srt/dllm/ — generation proceeds in fixed-size
BLOCKS: the block starts fully masked, each denoise step runs the model
over the block (bidirectional within the block, causal over the prefix)
and unmasks the positions the algorithm selects, until the block is
complete; then its tokens are emitted and the next block starts. TPU
recast: a denoise step is the existing tree-verify extend program with an
all-ones in-block mask — one page-gather attention pass per round, same
compiled shapes as speculative verify, nothing new to compile.
"""

from sglang_tpu.dllm.config import DLLM_PARAMS, DllmConfig  # noqa: F401
from sglang_tpu.dllm.algorithm import (  # noqa: F401
    DllmAlgorithm,
    JointThreshold,
    LowConfidence,
    get_algorithm,
)
