"""Text-to-image pipeline: encode -> scan-denoise -> decode.

Ref: multimodal_gen/runtime/pipelines_core/ (ComposedPipeline stages).
The reference drives the denoise loop from python with CUDA-graph
wrappers per step; here the ENTIRE loop is one lax.scan inside one jit
per (batch, size, steps) bucket — scheduler coefficients ride as scan
inputs, classifier-free guidance doubles the batch inside the program,
and the VAE decode fuses into the same program's tail.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.diffusion.scheduler import get_scheduler


@dataclasses.dataclass
class GenRequest:
    prompt: str
    negative_prompt: str = ""
    height: int = 256
    width: int = 256
    steps: int = 20
    guidance_scale: float = 4.5
    seed: int = 0


class DiffusionPipeline:
    def __init__(self, dit, dit_params, vae, vae_params, text_encoder,
                 text_params, tokenizer, *, scheduler: str,
                 latent_scale: int = 8, shift: float = 1.0):
        self.dit = dit
        self.dit_params = dit_params
        self.vae = vae
        self.vae_params = vae_params
        self.text = text_encoder
        self.text_params = text_params
        self.tokenizer = tokenizer
        self.scheduler = scheduler
        self.latent_scale = latent_scale
        self.shift = shift
        self._encode = jax.jit(
            lambda p, ids: self.text(p, ids)
        )

    # ------------------------------------------------------------ stages
    def encode_prompts(self, prompts: List[str]) -> jax.Array:
        if self.tokenizer.pad_token is None:
            self.tokenizer.pad_token = self.tokenizer.eos_token or "<unk>"
        enc = self.tokenizer(
            prompts, padding="max_length", truncation=True,
            max_length=min(77, self.text.max_pos), return_tensors="np",
        )
        hidden, _pooled = self._encode(
            self.text_params, jnp.asarray(enc["input_ids"])
        )
        return hidden

    @partial(jax.jit, static_argnums=(0,), static_argnames=("steps",))
    def _denoise_decode(self, dit_params, vae_params, noise, ctx, ctx_neg,
                        timesteps, x_coef, out_coef, guidance, *, steps):
        B = noise.shape[0]

        def body(x, per_step):
            t, a, b = per_step
            tb = jnp.full((2 * B,), t, jnp.float32)
            both = jnp.concatenate([x, x], axis=0)
            cc = jnp.concatenate([ctx, ctx_neg], axis=0)
            out = self.dit(dit_params, both, tb, cc)
            cond, uncond = out[:B], out[B:]
            guided = uncond + guidance * (cond - uncond)
            return a * x + b * guided, None

        x, _ = jax.lax.scan(body, noise, (timesteps, x_coef, out_coef),
                            length=steps)
        return self.vae(vae_params, x)

    # ------------------------------------------------------------- public
    def generate(self, reqs: List[GenRequest]) -> np.ndarray:
        """All reqs share (height, width, steps, guidance) — the engine
        groups them. Returns [B, H, W, 3] uint8."""
        r0 = reqs[0]
        plan = get_scheduler(
            self.scheduler, r0.steps,
            **({"shift": self.shift}
               if self.scheduler == "flow_match_euler" else {}),
        )
        ctx = self.encode_prompts([r.prompt for r in reqs])
        ctx_neg = self.encode_prompts([r.negative_prompt for r in reqs])
        lh = r0.height // self.latent_scale
        lw = r0.width // self.latent_scale
        noise = jnp.stack([
            jax.random.normal(
                jax.random.PRNGKey(r.seed), (self.dit.c, lh, lw),
                jnp.float32,
            ) * plan.init_sigma
            for r in reqs
        ])
        img = self._denoise_decode(
            self.dit_params, self.vae_params, noise, ctx, ctx_neg,
            jnp.asarray(plan.timesteps), jnp.asarray(plan.x_coef),
            jnp.asarray(plan.out_coef),
            jnp.float32(r0.guidance_scale), steps=r0.steps,
        )
        img = np.asarray(img)  # [B, 3, H, W] in [-1, 1]
        img = ((img.transpose(0, 2, 3, 1) + 1.0) * 127.5).clip(0, 255)
        return img.astype(np.uint8)
