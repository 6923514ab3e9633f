"""KV canary: content-corruption detection for freed pages.

Ref behavior: srt/kv_canary/ — when a page returns to the allocator, a
known bit pattern is stamped into its KV rows on every layer; when the
page is next handed out, the stamp is verified. A mismatch means some
kernel wrote into a page it did not own while it sat on the free list
(use-after-free / stale-DMA corruption) — exactly the class of bug the
page-OWNERSHIP invariant checker (core/invariants.py) cannot see.

Debug mode (--enable-kv-canary): every free/alloc round-trips the
device, so throughput drops; run it in CI and repros, not production.
"""

from __future__ import annotations

import logging
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

CANARY_BYTE = 0x5C
CANARY_I32 = int.from_bytes(bytes([CANARY_BYTE] * 4), "little", signed=True)
# Exactly representable in bf16/f16/f32 so stamp and check agree bit-for-bit.
CANARY_F = -123.5


class CanaryAllocator:
    """Drop-in PageAllocator wrapper that stamps + verifies canaries."""

    def __init__(self, inner, runner):
        self._inner = inner
        self._runner = runner
        self.num_checked = 0
        self.num_stamped = 0
        self._stamped: set = set()  # only stamped pages are checkable
        import jax
        import jax.numpy as jnp

        def stamp(kv, pages):
            new = []
            for kp, vp in kv:
                cval = jnp.asarray(
                    CANARY_I32 if kp.dtype == jnp.int32 else CANARY_F,
                    kp.dtype,
                )
                kp = kp.at[pages].set(cval)
                if vp is not None:
                    vp = vp.at[pages].set(cval)
                new.append((kp, vp))
            return tuple(new)

        def gather(kv, pages):
            outs = []
            for kp, vp in kv:
                outs.append(kp[pages])
                if vp is not None:
                    outs.append(vp[pages])
            return outs

        self._stamp = jax.jit(stamp, donate_argnums=(0,))
        self._gather = jax.jit(gather)

    # ---- PageAllocator API ----
    @property
    def num_pages(self):
        return self._inner.num_pages

    @property
    def page_size(self):
        return self._inner.page_size

    @property
    def free_pages(self):
        return self._inner.free_pages

    def available_pages(self) -> int:
        return self._inner.available_pages()

    def available_tokens(self) -> int:
        return self._inner.available_tokens()

    def clear(self) -> None:
        self._inner.clear()
        self._stamped.clear()

    def free(self, pages: List[int]) -> None:
        self._inner.free(pages)
        if pages and self._runner.kv_pool.kv is not None:
            pool = self._runner.kv_pool
            pool.swap(
                self._stamp(pool.kv, np.asarray(pages, np.int32))
            )
            self.num_stamped += len(pages)
            self._stamped.update(pages)

    def alloc(self, num_pages: int, start_idx=None) -> Optional[List[int]]:
        pages = self._inner.alloc(num_pages, start_idx=start_idx)
        if pages:
            checkable = [p for p in pages if p in self._stamped]
            if checkable:
                self.check(checkable)
                self._stamped.difference_update(checkable)
        return pages

    def check(self, pages: List[int]) -> None:
        """Verify the canary stamp on pages about to be handed out."""
        pool = self._runner.kv_pool
        outs = self._gather(pool.kv, np.asarray(pages, np.int32))
        for arr in outs:
            a = np.asarray(arr)
            want = np.asarray(
                CANARY_I32 if a.dtype == np.int32 else CANARY_F, a.dtype
            )
            if not np.all(a == want):
                bad = [
                    int(pages[i])
                    for i in range(len(pages))
                    if not np.all(np.asarray(a[i]) == want)
                ]
                raise AssertionError(
                    f"KV canary violated on pages {bad[:8]}: a kernel "
                    "wrote into freed pages (use-after-free corruption)"
                )
        self.num_checked += len(pages)
