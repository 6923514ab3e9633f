"""CLIP text encoder (conditioning tower for latent diffusion).

Ref: multimodal_gen/runtime/models/encoders/ (CLIP/T5 text towers).
Implements the HF CLIPTextModel graph — causal pre-LN transformer with
quick_gelu, final LN, pooled state at the EOS position — in the
functional param-spec style; parity vs transformers.CLIPTextModel is
tested (tests/test_diffusion.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join


class ClipTextEncoder:
    def __init__(self, hf_config, dtype=jnp.float32):
        c = hf_config
        self.v = c.vocab_size
        self.d = c.hidden_size
        self.L = c.num_hidden_layers
        self.nh = c.num_attention_heads
        self.hd = self.d // self.nh
        self.ffn = c.intermediate_size
        self.max_pos = c.max_position_embeddings
        self.eps = getattr(c, "layer_norm_eps", 1e-5)
        self.act = getattr(c, "hidden_act", "quick_gelu")
        self.eos_id = getattr(c, "eos_token_id", 2)
        self.dtype = dtype

    def param_specs(self) -> SpecTree:
        dt = self.dtype
        s: SpecTree = {
            "tok/weight": ParamSpec((self.v, self.d), dt, P()),
            "pos/weight": ParamSpec((self.max_pos, self.d), dt, P()),
            "ln_final/weight": ParamSpec((self.d,), dt, P()),
            "ln_final/bias": ParamSpec((self.d,), dt, P()),
        }
        for i in range(self.L):
            p = f"layers/{i}"
            for nm, shape in (
                ("q", (self.d, self.d)), ("k", (self.d, self.d)),
                ("v", (self.d, self.d)), ("o", (self.d, self.d)),
                ("fc1", (self.d, self.ffn)), ("fc2", (self.ffn, self.d)),
            ):
                s[join(p, nm, "weight")] = ParamSpec(shape, dt, P())
                s[join(p, nm, "bias")] = ParamSpec((shape[1],), dt, P())
            for ln in ("ln1", "ln2"):
                s[join(p, ln, "weight")] = ParamSpec((self.d,), dt, P())
                s[join(p, ln, "bias")] = ParamSpec((self.d,), dt, P())
        return s

    def _ln(self, params, p, x):
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True)
        h = (x32 - mu) * jax.lax.rsqrt(var + self.eps)
        return (h * params[join(p, "weight")] + params[join(p, "bias")]).astype(x.dtype)

    def _lin(self, params, p, x):
        return x @ params[join(p, "weight")] + params[join(p, "bias")]

    def _act(self, x):
        if self.act == "quick_gelu":
            return x * jax.nn.sigmoid(1.702 * x)
        return jax.nn.gelu(x, approximate=False)

    def __call__(self, params: Params, ids: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
        """ids [B, L] -> (hidden [B, L, D], pooled [B, D])."""
        B, L = ids.shape
        h = params["tok/weight"][ids] + params["pos/weight"][:L][None]
        causal = jnp.tril(jnp.ones((L, L), bool))
        for i in range(self.L):
            p = f"layers/{i}"
            r = h
            x = self._ln(params, join(p, "ln1"), h)
            q = self._lin(params, join(p, "q"), x).reshape(B, L, self.nh,
                                                           self.hd)
            k = self._lin(params, join(p, "k"), x).reshape(B, L, self.nh,
                                                           self.hd)
            v = self._lin(params, join(p, "v"), x).reshape(B, L, self.nh,
                                                           self.hd)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                           preferred_element_type=jnp.float32)
            s = s * self.hd**-0.5
            s = jnp.where(causal[None, None], s, -jnp.inf)
            a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, L, self.d)
            h = r + self._lin(params, join(p, "o"), o)
            r = h
            x = self._ln(params, join(p, "ln2"), h)
            h = r + self._lin(params, join(p, "fc2"),
                              self._act(self._lin(params, join(p, "fc1"),
                                                  x)))
        h = self._ln(params, "ln_final", h)
        # pooled = hidden at the EOS position. HF quirk: original CLIP
        # checkpoints (eos_token_id == 2) pool at input_ids.argmax() —
        # the legacy branch in CLIPTextTransformer.forward — newer
        # configs pool at the first true EOS.
        if self.eos_id == 2:
            eos_pos = jnp.argmax(ids, axis=1)
        else:
            eos_pos = jnp.argmax((ids == self.eos_id).astype(jnp.int32),
                                 axis=1)
        pooled = h[jnp.arange(B), eos_pos]
        return h, pooled

    # ------------------------------------------------------------ weights
    _MAP = {
        "q_proj": "q", "k_proj": "k", "v_proj": "v", "out_proj": "o",
        "mlp.fc1": "fc1", "mlp.fc2": "fc2",
        "layer_norm1": "ln1", "layer_norm2": "ln2",
    }

    def map_hf_weight(self, name: str, arr: np.ndarray):
        n = name.replace("text_model.", "")
        if n == "embeddings.token_embedding.weight":
            yield "tok/weight", None, arr
            return
        if n == "embeddings.position_embedding.weight":
            yield "pos/weight", None, arr
            return
        if n.startswith("final_layer_norm."):
            yield f"ln_final/{n.split('.')[-1]}", None, arr
            return
        if n.startswith("encoder.layers."):
            parts = n.split(".")
            i = parts[2]
            leaf = parts[-1]  # weight | bias
            mid = ".".join(parts[3:-1])
            for k, v in self._MAP.items():
                if mid.endswith(k):
                    a = arr.T if (leaf == "weight" and arr.ndim == 2) else arr
                    yield f"layers/{i}/{v}/{leaf}", None, a
                    return
