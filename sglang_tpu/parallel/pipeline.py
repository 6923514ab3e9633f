"""Pipeline parallelism: GSPMD-native GPipe over the "pp" mesh axis.

Behavioral reference: srt/managers/scheduler_pp_mixin.py:69 (event_loop_pp
microbatch loop) + srt/distributed/parallel_state.py:1948 (_PP groups).
TPU-native redesign: instead of one scheduler process per pipeline stage
exchanging PPProxyTensors over NCCL, the WHOLE pipeline lives inside the
single jitted step program:

- Homogeneous decoder-layer params are STACKED along a leading layer dim
  and sharded over the "pp" mesh axis (stage s owns layers
  [s*L/S, (s+1)*L/S)); the KV pool is stacked the same way.
- The forward runs a classic GPipe schedule inside a partial-manual
  `jax.shard_map` (manual over "pp" only — "tp"/"dp" stay GSPMD-auto, so
  the tensor-parallel linears keep their compiler-inserted collectives):
  the batch splits into M microbatches; at tick t stage s runs its layer
  block on microbatch t-s and hands activations to stage s+1 with
  `jax.lax.ppermute` over the ICI ring. M + S - 1 ticks drain the pipe.
- The scheduler is UNCHANGED (one ForwardBatch per step): microbatching
  slices the batch's token-dim arrays; per-sequence tables replicate.
  Chunked-prefill causality holds because microbatch m+1 reaches every
  stage strictly after microbatch m wrote its KV there.

Constraints (asserted): homogeneous layers (supports_pp model flag),
L % pp == 0, no LoRA, no weight quantization on layer params, no
recurrent models.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.base import ParamSpec, Params, SpecTree
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.parallel.mesh import AXIS_PP, MeshContext

STACK = "layers_stacked"


def _is_layer_param(name: str) -> bool:
    return name.startswith("layers/")


def _split_layer_name(name: str):
    _, idx, suffix = name.split("/", 2)
    return int(idx), suffix


class PipelinedModel:
    """Wraps a homogeneous-decoder causal LM for pp_size > 1 meshes.

    Exposes the same model interface the runner consumes
    (param_specs / __call__ / compute_logits / map_hf_weight)."""

    def __init__(self, inner, mesh_ctx: MeshContext,
                 microbatches: Optional[int] = None):
        assert getattr(inner, "supports_pp", False), (
            f"{type(inner).__name__} does not support pipeline parallelism "
            "(needs homogeneous decoder layers)"
        )
        self.inner = inner
        self.config = inner.config
        self.mesh_ctx = mesh_ctx
        self.S = mesh_ctx.pp_size
        L = inner.config.num_hidden_layers
        assert L % self.S == 0, (
            f"num_hidden_layers={L} not divisible by pp_size={self.S}"
        )
        self.L = L
        self.Lloc = L // self.S
        self.M_target = microbatches or self.S
        # One layer body reused for every stacked layer (layer_id 0).
        self.body = inner.decoder_layers[0]
        inner_specs = inner.param_specs()
        self.layer_suffix_specs: Dict[str, ParamSpec] = {}
        self.other_specs: Dict[str, ParamSpec] = {}
        for name, sp in inner_specs.items():
            if _is_layer_param(name):
                idx, suffix = _split_layer_name(name)
                if idx == 0:
                    assert sp.quant_method is None, (
                        "PP + weight-quantized layer params not supported yet"
                    )
                    self.layer_suffix_specs[suffix] = sp
            else:
                self.other_specs[name] = sp

    # ---- model interface -------------------------------------------------
    def __getattr__(self, name):
        # proxy model flags (is_multimodal, mla_dim, ...) to the inner model
        if name == "inner":
            raise AttributeError(name)
        return getattr(self.inner, name)

    def param_specs(self) -> SpecTree:
        s = dict(self.other_specs)
        for suffix, sp in self.layer_suffix_specs.items():
            s[f"{STACK}/{suffix}"] = ParamSpec(
                (self.L,) + tuple(sp.shape),
                sp.dtype,
                P(AXIS_PP, *sp.spec),
                init_scale=sp.init_scale,
                init_value=sp.init_value,
                # dummy loads draw each layer slice with its per-layer
                # name: stacked == unstacked weights (parity checks).
                dummy_names=tuple(
                    f"layers/{l}/{suffix}" for l in range(self.L)
                ),
            )
        return s

    def map_hf_weight(self, name: str, arr):
        out = []
        for pname, slot, a in self.inner.map_hf_weight(name, arr):
            if _is_layer_param(pname):
                idx, suffix = _split_layer_name(pname)
                out.append((f"{STACK}/{suffix}", ("stack", idx, slot), a))
            else:
                out.append((pname, slot, a))
        return out

    def compute_logits(self, params: Params, hidden: jax.Array) -> jax.Array:
        return self.inner.compute_logits(params, hidden)

    # ---- microbatch selection -------------------------------------------
    def _pick_m(self, fb: ForwardBatch) -> int:
        T = fb.padded_num_tokens
        if fb.mode.is_decode():
            div = fb.padded_bs
        else:
            div = T // fb.extend_align  # number of q blocks
        m = self.M_target
        while m > 1 and div % m:
            m -= 1
        return max(m, 1)

    # ---- forward ---------------------------------------------------------
    def __call__(self, params: Params, fb: ForwardBatch, kv, attn_backend,
                 lora=None, input_embeds=None, embed_mask=None):
        assert lora is None, "PP + LoRA not supported yet"
        inner = self.inner
        x = inner.embed(params, "embed", fb.input_ids)
        if input_embeds is not None:
            x = jnp.where(embed_mask[:, None], input_embeds.astype(x.dtype), x)

        M = self._pick_m(fb)
        S, Lloc = self.S, self.Lloc
        T = x.shape[0]
        Tm = T // M
        H = x.shape[-1]
        decode = fb.mode.is_decode()

        layer_params = {
            suffix: params[f"{STACK}/{suffix}"]
            for suffix in self.layer_suffix_specs
        }
        k_st, v_st = kv  # ([L, NP, ps, ...], [L, NP, ps, ...] or None)
        mla = v_st is None
        assert fb.swa_page_table is None, "PP + SWA pools unsupported"
        assert fb.spec_tree_mask is None, "PP + tree verify unsupported"

        # --- microbatched arrays: token-dim always; per-seq too for decode
        def mb_split(a):
            return a.reshape((M, a.shape[0] // M) + a.shape[1:])

        tok: Dict[str, Any] = dict(
            positions=mb_split(fb.positions),
            seq_ids=mb_split(fb.seq_ids),
            out_cache_loc=mb_split(fb.out_cache_loc),
        )
        if fb.mrope_positions is not None and not decode:
            tok["mrope_positions"] = fb.mrope_positions.reshape(
                3, M, Tm
            ).swapaxes(0, 1)  # [M, 3, Tm]
        if not decode:
            NB = fb.block_seq.shape[0]
            tok["block_seq"] = fb.block_seq.reshape(M, NB // M)
            tok["block_q_off"] = fb.block_q_off.reshape(M, NB // M)
        if decode:
            # decode rows are independent: split the per-seq arrays too
            tok["seq_lens"] = mb_split(fb.seq_lens)
            tok["page_table"] = mb_split(fb.page_table)
            if fb.mrope_delta is not None:
                tok["mrope_delta"] = mb_split(fb.mrope_delta)

        x_mb = x.reshape(M, Tm, H)
        backend = attn_backend
        body = self.body
        trash_loc = 0  # slot 0 lives on the reserved trash page
        Lloc, L = self.Lloc, self.L
        decode_extras: Dict[str, Any] = {}
        if decode:
            decode_extras = dict(
                cu_q_lens=jnp.arange(Tm + 1, dtype=jnp.int32),
                q_lens=jnp.ones((Tm,), jnp.int32),
                num_seqs=jnp.minimum(fb.num_seqs, Tm),
                logits_indices=jnp.arange(Tm, dtype=jnp.int32),
                req_slots=jnp.zeros((Tm,), jnp.int32),  # unused in-model
                prefix_lens=jnp.zeros((Tm,), jnp.int32),
                state_slots=jnp.zeros((Tm,), jnp.int32),
            )

        perm = [(i, (i + 1) % S) for i in range(S)]

        def pipeline(lp, k_loc, v_loc, x_mb, tok_arrs):
            # lp: {suffix: [Lloc, ...]} local stage params
            # k_loc/v_loc: [Lloc, NP, ps, ...] local stage KV pools
            s_idx = jax.lax.axis_index(AXIS_PP)

            def mb_fb(t_mb, valid):
                """ForwardBatch view of microbatch t_mb (device slicing;
                pipeline-bubble ticks write KV to the trash page)."""
                d: Dict[str, Any] = {
                    k: a[t_mb] for k, a in tok_arrs.items()
                }
                d["out_cache_loc"] = jnp.where(
                    valid, d["out_cache_loc"], trash_loc
                )
                d["input_ids"] = jnp.zeros((Tm,), jnp.int32)  # post-embed
                d.update(decode_extras)
                if decode:
                    d["seq_ids"] = jnp.arange(Tm, dtype=jnp.int32)
                return dataclasses.replace(fb, **d)

            recv_x = jnp.zeros((Tm, H), x_mb.dtype)
            recv_r = jnp.zeros((Tm, H), x_mb.dtype)
            outbuf = jnp.zeros((M, Tm, H), x_mb.dtype)
            outres = jnp.zeros((M, Tm, H), x_mb.dtype)
            for t in range(M + S - 1):
                mb = t - s_idx  # this stage's microbatch index (traced)
                valid = (mb >= 0) & (mb < M)
                mb_c = jnp.clip(mb, 0, M - 1)
                is_first = s_idx == 0
                inp_x = jnp.where(is_first, x_mb[mb_c], recv_x)
                inp_r = jnp.where(is_first, jnp.zeros_like(recv_r), recv_r)
                fbt = mb_fb(mb_c, valid)
                cx, cr = inp_x, inp_r
                for l in range(Lloc):
                    pl = {
                        f"layers/0/{suffix}": lp[suffix][l]
                        for suffix in lp
                    }
                    kv_view = ((k_loc[l], None if mla else v_loc[l]),)
                    cx, cr, kv_view = body(
                        pl, "layers/0", cx, cr, fbt, kv_view, backend
                    )
                    k_loc = k_loc.at[l].set(kv_view[0][0])
                    if not mla:
                        v_loc = v_loc.at[l].set(kv_view[0][1])
                wb = valid & (s_idx == S - 1)
                outbuf = outbuf.at[mb_c].set(
                    jnp.where(wb, cx, outbuf[mb_c])
                )
                outres = outres.at[mb_c].set(
                    jnp.where(wb, cr, outres[mb_c])
                )
                if t < M + S - 2:
                    recv_x = jax.lax.ppermute(cx, AXIS_PP, perm)
                    recv_r = jax.lax.ppermute(cr, AXIS_PP, perm)
            # Broadcast last stage's result to every pp shard. psum in
            # f32: exact (one nonzero term per element) AND works around
            # an XLA:CPU crash lowering bf16 psum inside partial-manual
            # shard_map ("Invalid binary instruction opcode copy").
            zero = jnp.zeros_like(outbuf)
            dt = outbuf.dtype
            outbuf = jax.lax.psum(
                jnp.where(s_idx == S - 1, outbuf, zero).astype(jnp.float32),
                AXIS_PP,
            ).astype(dt)
            outres = jax.lax.psum(
                jnp.where(s_idx == S - 1, outres, zero).astype(jnp.float32),
                AXIS_PP,
            ).astype(dt)
            return outbuf, outres, k_loc, v_loc

        lp_specs = {s_: P(AXIS_PP) for s_ in layer_params}
        tok_specs = {k: P() for k in tok}
        v_in = v_st if not mla else jnp.zeros((L, 1, 1), k_st.dtype)
        outbuf, outres, k_new, v_new = jax.shard_map(
            pipeline,
            mesh=self.mesh_ctx.mesh,
            in_specs=(lp_specs, P(AXIS_PP), P(AXIS_PP), P(), tok_specs),
            out_specs=(P(), P(), P(AXIS_PP), P(AXIS_PP)),
            axis_names={AXIS_PP},
            check_vma=False,
        )(layer_params, k_st, v_in, x_mb, tok)
        hidden = outbuf.reshape(T, H)
        residual = outres.reshape(T, H)
        hidden, _ = inner.final_norm(params, "final_norm", hidden, residual)
        return hidden, (k_new, None if mla else v_new)
