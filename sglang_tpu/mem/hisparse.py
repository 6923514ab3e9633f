"""HiSparse: host-resident latent KV for DSA models, device top-k reads.

Ref: srt/managers/hisparse_coordinator.py + mem_cache/hisparse_memory_pool
.py. The reference keeps the full MLA latent KV in a HOST pool and a
small per-request device buffer; each DSA layer's indexer picks top-k
context tokens and a CUDA kernel swaps exactly those rows device-side
mid-stream (dsa_backend.py swap_in_selected_pages).

TPU redesign: a mid-program data-dependent host copy is not expressible
in one XLA program via streams — but it IS expressible as an XLA host
callback. So the latent pool becomes numpy on host, addressed by the
same flat slot ids as the device index pool:

- write: `io_callback(pool.writer(layer), ..., ordered=True)` appends
  the step's latent rows host-side, in program order;
- read: the indexer (device-resident — the index-K cache is ~22% of the
  MLA bytes and stays in HBM) computes top-k slots, and an ordered
  io_callback gathers ONLY those [T, K, D] rows back. K*T rows per layer
  cross the PCIe/host link — the same traffic the reference's swap
  kernel moves.

Device HBM then holds no latent pool at all: token capacity is set by
the index pool, and the reference's per-request device ring buffer +
staging queue bookkeeping disappears (the callback gathers by slot id
directly). Exactness: with k_eff = min(top_k, padded_context) the
sparse path equals dense MLA attention whenever the context fits the
budget, so hisparse-on vs -off is bit-identical under that bound
(tests/test_hisparse.py).
"""

from __future__ import annotations

from typing import List

import numpy as np


class HostLatentPool:
    """Per-layer host latent rows, flat slot-indexed ([num_slots, D]).

    Slot ids are page_id * page_size + offset — identical to the device
    pools' addressing, so the radix cache / allocator need no changes:
    a reused page simply overwrites its host rows on the next write.
    """

    def __init__(self, num_layers: int, num_slots: int, dim: int,
                 dtype=np.float32):
        self.rows: List[np.ndarray] = [
            np.zeros((num_slots, dim), dtype) for _ in range(num_layers)
        ]
        self.dim = dim
        self.dtype = dtype
        self.swapped_in = 0  # rows gathered back (observability)
        self.written = 0

    def writer(self, layer_id: int):
        buf = self.rows[layer_id]

        def write(slots, rows):
            s = np.asarray(slots).reshape(-1)
            buf[s] = np.asarray(rows, self.dtype).reshape(len(s), -1)
            self.written += len(s)
            return np.int32(0)

        return write

    def gatherer(self, layer_id: int):
        buf = self.rows[layer_id]

        def gather(slots):
            s = np.asarray(slots)
            self.swapped_in += s.size
            return buf[s]

        return gather

    def bytes_total(self) -> int:
        return sum(r.nbytes for r in self.rows)
