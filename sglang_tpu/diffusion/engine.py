"""DiffGenerator: checkpoint loading + request batching.

Ref: multimodal_gen/runtime/entrypoints/diffusion_generator.py
(DiffGenerator.from_pretrained / generate) + managers/scheduler.py
(dynamic batch admission). Checkpoint layout is diffusers-style subdirs:

    model_path/
      model_index.json          {"dit": {...}, "vae": {...},
                                 "scheduler": "flow_match_euler", ...}
      dit/*.safetensors         (this package's canonical param names)
      vae/*.safetensors
      text_encoder/             (HF CLIPTextModel checkpoint)
      tokenizer/                (HF tokenizer)

Requests batch by (height, width, steps, guidance, scheduler) bucket —
one compiled program per bucket, same static-shape discipline as the LLM
decode buckets.
"""

from __future__ import annotations

import json
import logging
import os
import queue
import threading
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from sglang_tpu.diffusion.clip_text import ClipTextEncoder
from sglang_tpu.diffusion.dit import DiT
from sglang_tpu.diffusion.pipeline import DiffusionPipeline, GenRequest
from sglang_tpu.diffusion.vae import VAEDecoder

logger = logging.getLogger(__name__)


def _load(model, subdir: str, dummy_seed: Optional[int]):
    from sglang_tpu.model_exec.weight_loader import load_model_weights

    specs = model.param_specs()
    if dummy_seed is not None:
        return load_model_weights(model, specs, None, subdir,
                                  load_format="dummy", seed=dummy_seed)
    return load_model_weights(model, specs, None, subdir)


class DiffGenerator:
    """Offline generator + the serving core behind the images API."""

    def __init__(self, pipeline: DiffusionPipeline, max_batch: int = 8):
        self.pipeline = pipeline
        self.max_batch = max_batch
        self._lock = threading.Lock()

    # ------------------------------------------------------------ loading
    @staticmethod
    def from_pretrained(model_path: str, *, load_format: str = "auto",
                        dtype=jnp.bfloat16, max_batch: int = 8
                        ) -> "DiffGenerator":
        from transformers import AutoTokenizer, CLIPTextConfig

        with open(os.path.join(model_path, "model_index.json")) as f:
            index = json.load(f)
        dummy = 0 if load_format == "dummy" else None
        dit = DiT(dtype=dtype, **index["dit"])
        vae = VAEDecoder(dtype=dtype, **index["vae"])
        te_dir = os.path.join(model_path, "text_encoder")
        te_cfg = CLIPTextConfig.from_pretrained(te_dir)
        text = ClipTextEncoder(te_cfg)
        tok = AutoTokenizer.from_pretrained(
            os.path.join(model_path, "tokenizer")
        )
        pipe = DiffusionPipeline(
            dit, _load(dit, os.path.join(model_path, "dit"), dummy),
            vae, _load(vae, os.path.join(model_path, "vae"), dummy),
            text, _load(text, te_dir, dummy),
            tok,
            scheduler=index.get("scheduler", "flow_match_euler"),
            latent_scale=index.get("latent_scale", 8),
            shift=index.get("shift", 1.0),
        )
        return DiffGenerator(pipe, max_batch=max_batch)

    # ---------------------------------------------------------- inference
    def generate(self, reqs: List[GenRequest]) -> List[np.ndarray]:
        """Synchronous batched generation; splits by bucket key. Returns
        one [H, W, 3] uint8 array per request (sizes may differ)."""
        out: List[Optional[np.ndarray]] = [None] * len(reqs)
        by_key = {}
        for i, r in enumerate(reqs):
            key = (r.height, r.width, r.steps, r.guidance_scale)
            by_key.setdefault(key, []).append(i)
        with self._lock:  # one program on the chip at a time
            for idxs in by_key.values():
                for s in range(0, len(idxs), self.max_batch):
                    chunk = idxs[s: s + self.max_batch]
                    imgs = self.pipeline.generate([reqs[i] for i in chunk])
                    for j, i in enumerate(chunk):
                        out[i] = imgs[j]
        return out


class BatchingQueue:
    """Tiny admission window so concurrent HTTP requests co-batch
    (ref managers/dynamic_batch_admission.py)."""

    def __init__(self, gen: DiffGenerator, window_ms: float = 10.0):
        self.gen = gen
        self.window = window_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, req: GenRequest) -> "queue.Queue":
        done: "queue.Queue" = queue.Queue(1)
        self._q.put((req, done))
        return done

    def _loop(self):
        import time

        while True:
            req, done = self._q.get()
            batch = [(req, done)]
            t0 = time.time()
            while (len(batch) < self.gen.max_batch
                   and time.time() - t0 < self.window):
                try:
                    batch.append(self._q.get(timeout=self.window))
                except queue.Empty:
                    break
            try:
                imgs = self.gen.generate([r for r, _ in batch])
                for i, (_, d) in enumerate(batch):
                    d.put(("ok", imgs[i]))
            except Exception as e:  # noqa: BLE001
                for _, d in batch:
                    d.put(("error", str(e)))
