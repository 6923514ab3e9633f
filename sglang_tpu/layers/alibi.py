"""ALiBi slope computation (train-short-test-long position bias).

Ref behavior: srt/layers/attention/ (alibi models) / HF
modeling_bloom.build_alibi_tensor — the geometric slope ladder, padded
with odd-power extras when num_heads is not a power of two. The bias
itself (slope * key-query distance) is applied inside the attention
backends (alibi_slopes kwarg); slopes * absolute key position (HF's
form) differs only by a per-row constant, which softmax cancels.
"""

from __future__ import annotations

import math

import numpy as np


def alibi_slopes(num_heads: int) -> np.ndarray:
    closest = 2 ** math.floor(math.log2(num_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(closest) - 3)))
    slopes = base ** np.arange(1, closest + 1, dtype=np.float64)
    if closest != num_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * closest) - 3)))
        n_extra = min(closest, num_heads - closest)
        extra = extra_base ** np.arange(1, 1 + 2 * n_extra, 2,
                                        dtype=np.float64)
        slopes = np.concatenate([slopes, extra])
    return slopes.astype(np.float32)  # [num_heads]
