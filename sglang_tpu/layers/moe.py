"""Mixture-of-Experts layer (TPU-native, dropless).

Behavioral reference: srt/layers/moe/{topk.py,fused_moe_triton/,ep_moe/}.
TPU design: tokens are sorted by routed expert and the expert FFNs run as
grouped matmuls via jax.lax.ragged_dot (the Megablox-style dropless
grouped GEMM XLA lowers to MXU-tiled kernels).

Two parallelism modes:
- MoE-TP (default): expert weights carry a "tp"-axis PartitionSpec on the
  FFN hidden dim, so each chip computes every expert on its intermediate
  shard.
- EP (--ep-size == tp_size, ref srt/layers/moe/ep_moe/): experts are
  partitioned over the same devices. Two dispatch modes:
  * padded (default off-axis fallback): each shard runs ONE grouped GEMM
    over the globally expert-sorted token stream with zero-weight
    "before"/"after" padding groups absorbing other shards' rows, then a
    psum combines — dropless and exact with no dispatch traffic but every
    shard READS the full stream.
  * ragged all-to-all (--moe-a2a-backend ragged; ref
    srt/layers/moe/token_dispatcher/ + DeepEP): the token stream is
    sharded over the axis, each shard sorts its slice by expert, sends
    each destination shard exactly the rows its experts own via
    jax.lax.ragged_all_to_all, runs the local grouped GEMM over ONLY the
    received rows (1/ep of the stream when balanced), and returns results
    through the reverse ragged a2a — dropless, exact, and the per-shard
    GEMM read volume drops ep-fold.

Numerics match HF Mixtral/Qwen2MoE: softmax over top-k (Mixtral
renormalizes over the selected k; Qwen2MoE optionally normalizes), f32
routing math.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join
from sglang_tpu.parallel.mesh import AXIS_TP, get_mesh_context

# Module-level dispatch config (set by ModelRunner before model build,
# like quantization.set_quant_method): "ragged" enables the ragged
# all-to-all EP dispatch; None keeps the padded-groups formulation.
_MOE_A2A: Optional[str] = None


def set_moe_a2a(backend: Optional[str]) -> None:
    global _MOE_A2A
    if backend not in (None, "none", "ragged"):
        raise ValueError(f"unknown --moe-a2a-backend {backend!r}")
    _MOE_A2A = None if backend in (None, "none") else backend


def get_moe_a2a() -> Optional[str]:
    return _MOE_A2A


# Two-batch overlap (ref srt/batch_overlap/two_batch_overlap.py:78). The
# reference hand-schedules two microbatches so microbatch B's MoE
# all-to-all rides under microbatch A's attention/GEMM compute on
# separate CUDA streams. The TPU recast: split the token stream into two
# INDEPENDENT dataflow chains through the dispatch (two ragged-a2a +
# grouped-GEMM sequences with no edge between them) inside one XLA
# program — XLA's async collectives + latency-hiding scheduler then
# start chain B's all-to-all while chain A's GEMMs occupy the MXU.
# Streams/events are the CUDA mechanism; independent dataflow is the
# XLA mechanism. Bonus: each chain's worst-case recv buffer (T*K rows)
# halves. Single-batch overlap (SBO, ref batch_overlap/sbo.py) — shared-
# expert compute riding under the routed dispatch — is already
# structural here: shared experts are a sibling chain of the FusedMoE
# call in every model that has them (e.g. models/deepseek_v2.py), so XLA
# may always overlap them; there is nothing to switch.
_TBO: bool = False


def set_tbo(enabled: bool) -> None:
    global _TBO
    _TBO = bool(enabled)


def get_tbo() -> bool:
    return _TBO


# Single-batch overlap (ref srt/batch_overlap/single_batch_overlap.py:28):
# the reference launches the shared-expert GEMMs on a side stream so they
# ride under the routed dispatch's all-to-all. TPU recast: with SBO on,
# models with shared experts hand FusedMoE the (replicated) shared weights
# and the shared FFN is computed INSIDE the EP shard_map on each shard's
# LOCAL token slice — an independent dataflow chain beside the a2a (the
# latency-hiding scheduler overlaps them), sharded over tokens instead of
# TP-sharded over features, and needing no psum of its own.
_SBO: bool = False


def set_sbo(enabled: bool) -> None:
    global _SBO
    _SBO = bool(enabled)


def get_sbo() -> bool:
    return _SBO


def shared_expert_ffn(x: jax.Array, sgu: jax.Array, sdn: jax.Array
                      ) -> jax.Array:
    """Gated shared-expert MLP on raw weight arrays: sgu [H, 2, Is],
    sdn [Is, H]."""
    gu = jnp.einsum("th,hni->tni", x, sgu.astype(x.dtype))
    h = jax.nn.silu(gu[:, 0, :]) * gu[:, 1, :]
    return jnp.dot(h, sdn.astype(x.dtype))


# EPLB redundant experts (ref --ep-num-redundant-experts,
# srt/eplb/eplb_algorithms/deepseek.py): each MoE layer carries
# P = E + R physical expert slots; hot logical experts occupy several
# slots (on different EP shards) and tokens fan out across the replicas.
# R must be divisible by ep_size (every shard holds P/ep slots).
_NUM_REDUNDANT: int = 0


def set_redundant_experts(n: int) -> None:
    global _NUM_REDUNDANT
    _NUM_REDUNDANT = int(n)


def get_redundant_experts() -> int:
    return _NUM_REDUNDANT


def _ragged_a2a(operand, output, in_off, send_sz, out_off, recv_sz,
                axis_name):
    """jax.lax.ragged_all_to_all, with a semantically identical
    emulation (all_gather + masked scatter) off-TPU — XLA:CPU has no
    ragged-all-to-all thunk, and the CPU test mesh must still exercise
    the dispatch layout math."""
    if jax.default_backend() == "tpu":
        return jax.lax.ragged_all_to_all(
            operand, output, in_off, send_sz, out_off, recv_sz,
            axis_name=axis_name,
        )
    ep = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    ops = jax.lax.all_gather(operand, axis_name)  # [ep, N, ...]
    in_offs = jax.lax.all_gather(in_off, axis_name)  # [ep, ep]
    out_offs = jax.lax.all_gather(out_off, axis_name)
    sends = jax.lax.all_gather(send_sz, axis_name)
    N = operand.shape[0]
    cap = output.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    buf = output
    for s in range(ep):
        src = jnp.clip(in_offs[s, me] + idx, 0, N - 1)
        rows = ops[s][src]
        valid = idx < sends[s, me]
        dst = jnp.where(valid, out_offs[s, me] + idx, cap)
        buf = buf.at[dst].set(rows, mode="drop")
    return buf


class FusedMoE:
    def __init__(
        self,
        num_experts: int,
        top_k: int,
        hidden_size: int,
        intermediate_size: int,
        dtype,
        renormalize: bool = True,
        route_fn=None,
        scale_input: bool = False,
        activation: str = "silu",
    ):
        self.num_experts = num_experts
        self.top_k = top_k
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.dtype = dtype
        self.renormalize = renormalize
        # Optional custom router: logits [T, E] -> (weights, idx) [T, K]
        # (e.g. PhiMoE's sparsemixer; models/phimoe.py).
        self.route_fn = route_fn
        # Llama4 (HF Llama4TextMoe): routing weights multiply the expert
        # INPUT (silu(W1 wx)*(W3 wx) is nonlinear in w, so this is not
        # output scaling); combine weights become 1.
        self.scale_input = scale_input
        # Expert FFN activation: "silu" (default) or "gelu" (tanh approx,
        # Grok; ref srt/models/grok.py Grok1MoE activation="gelu").
        self.activation = activation
        ctx = get_mesh_context()
        self.ep_size = ctx.ep_size if (
            ctx.ep_size > 1 and num_experts % ctx.ep_size == 0
        ) else 1
        # Redundant expert slots (EPLB replication). Physical slot count P
        # must stay divisible by ep for the expert-dim sharding.
        self.num_redundant = get_redundant_experts()
        if self.num_redundant and self.ep_size > 1:
            if self.num_redundant % self.ep_size != 0:
                raise ValueError(
                    f"--ep-num-redundant-experts {self.num_redundant} not "
                    f"divisible by ep_size {self.ep_size}"
                )
        self.num_physical = num_experts + self.num_redundant
        from sglang_tpu.quantization import get_quant_method

        # Expert weights quantize per (expert, out-channel); the dequant
        # multiply fuses into the ragged_dot operand read. w8a8's dynamic
        # activation path doesn't compose with ragged_dot (int8 grouped
        # GEMM unsupported) — it degrades to weight-only here.
        self.quant = get_quant_method()

    def specs(self, prefix: str) -> SpecTree:
        E, H, I = self.num_experts, self.hidden_size, self.intermediate_size
        R = self.num_redundant
        NP_ = self.num_physical
        if self.ep_size > 1:
            # EP: shard the EXPERT dim over the tp-axis devices.
            gu_spec = P(AXIS_TP, None, None, None)
            dn_spec = P(AXIS_TP, None, None)
        else:
            # MoE-TP: shard the FFN hidden dim.
            gu_spec = P(None, None, None, AXIS_TP)
            dn_spec = P(None, AXIS_TP, None)
        import numpy as np

        from sglang_tpu.eplb import MOE_LAYER_REGISTRY

        MOE_LAYER_REGISTRY[prefix] = E

        replicate = None
        if R:
            def replicate(buf, E=E, R=R):
                # Initial placement: physical slot E+j replicates logical
                # expert j (j < R); checkpoints only fill rows 0..E-1.
                buf[E:E + R] = buf[:R]
                return buf

        specs = {
            join(prefix, "router"): ParamSpec((H, E), self.dtype, P()),
            join(prefix, "w_gate_up"): ParamSpec(
                (NP_, H, 2, I), self.dtype, gu_spec,
                quant_method=self.quant, quant_axes=(1,),
                post_load=replicate,
            ),
            join(prefix, "w_down"): ParamSpec(
                (NP_, I, H), self.dtype, dn_spec,
                quant_method=self.quant, quant_axes=(1,),
                post_load=replicate,
            ),
        }
        if R:
            # Replicated placement: log2phy [E, Rmax] (replica slots,
            # padded with the primary), logcnt [E] live-replica counts.
            rmax = R + 1
            l2p = np.tile(np.arange(E, dtype=np.int32)[:, None], (1, rmax))
            l2p[:R, 1] = E + np.arange(R, dtype=np.int32)
            cnt = np.ones(E, np.int32)
            cnt[:R] = 2
            specs[join(prefix, "eplb_log2phy")] = ParamSpec(
                (E, rmax), jnp.int32, P(), init_value=l2p
            )
            specs[join(prefix, "eplb_logcnt")] = ParamSpec(
                (E,), jnp.int32, P(), init_value=cnt
            )
        else:
            # EPLB placement map (sglang_tpu/eplb.py): logical expert ->
            # physical slot; identity until a rebalance rewrites it.
            specs[join(prefix, "eplb_log2phy")] = ParamSpec(
                (E,), jnp.int32, P(), init_value=np.arange(E, dtype=np.int32)
            )
        return specs

    def _expert_weights(self, params: Params, prefix: str, dtype):
        """(w_gate_up, w_down), dequantized when quantization is on."""
        w_gu = params[join(prefix, "w_gate_up")]
        w_dn = params[join(prefix, "w_down")]
        if self.quant:
            s_gu = params[join(prefix, "w_gate_up/qscale")]  # [E, 2, I]
            s_dn = params[join(prefix, "w_down/qscale")]  # [E, H]
            if self.quant == "int4":
                from sglang_tpu.quantization import unpack_int4

                w_gu = unpack_int4(w_gu, 1)
                w_dn = unpack_int4(w_dn, 1)
            w_gu = w_gu.astype(dtype) * s_gu[:, None].astype(dtype)
            w_dn = w_dn.astype(dtype) * s_dn[:, None].astype(dtype)
        return w_gu, w_dn

    def __call__(self, params: Params, prefix: str, x: jax.Array,
                 lora=None) -> jax.Array:
        """x: [T, H] -> [T, H]."""
        E, K = self.num_experts, self.top_k
        router_logits = jnp.dot(
            x.astype(jnp.float32), params[join(prefix, "router")].astype(
                jnp.float32
            )
        )  # [T, E]
        if self.route_fn is not None:
            topk_weights, topk_idx = self.route_fn(router_logits)
        elif self.renormalize:
            topk_logits, topk_idx = jax.lax.top_k(router_logits, K)
            topk_weights = jax.nn.softmax(topk_logits, axis=-1)
        else:
            probs = jax.nn.softmax(router_logits, axis=-1)
            topk_weights, topk_idx = jax.lax.top_k(probs, K)
        from sglang_tpu.eplb import maybe_record

        maybe_record(prefix, topk_idx, E)
        # EPLB placement: logical -> physical expert slots.
        l2p = params[join(prefix, "eplb_log2phy")]
        if l2p.ndim == 2:
            # Redundant experts: fan tokens over an expert's replicas by
            # token position (deterministic, batch-order stable).
            cnt = params[join(prefix, "eplb_logcnt")][topk_idx]  # [T, K]
            pos = jnp.arange(topk_idx.shape[0], dtype=jnp.int32)[:, None]
            rep = (pos + jnp.arange(K, dtype=jnp.int32)[None, :]) % cnt
            topk_idx = jnp.take_along_axis(
                l2p[topk_idx], rep[..., None], axis=-1
            )[..., 0]
        else:
            topk_idx = l2p[topk_idx]
        return self.compute_experts(params, prefix, x, topk_weights, topk_idx)

    def _grouped_ffn(self, x_sorted, group_sizes, w_gu, w_dn):
        """gate/up/down grouped GEMMs over an expert-sorted token stream."""
        gate = jax.lax.ragged_dot(
            x_sorted, w_gu[:, :, 0, :], group_sizes,
            preferred_element_type=x_sorted.dtype,
        )  # [TK, I]
        up = jax.lax.ragged_dot(
            x_sorted, w_gu[:, :, 1, :], group_sizes,
            preferred_element_type=x_sorted.dtype,
        )
        if getattr(self, "activation", "silu") == "gelu":
            h = jax.nn.gelu(gate, approximate=True) * up
        else:
            h = jax.nn.silu(gate) * up
        return jax.lax.ragged_dot(
            h, w_dn, group_sizes, preferred_element_type=x_sorted.dtype
        )  # [TK, H]

    def compute_experts(self, params: Params, prefix: str, x: jax.Array,
                        topk_weights: jax.Array, topk_idx: jax.Array,
                        shared=None) -> jax.Array:
        """Dropless grouped-GEMM expert compute given routing decisions.

        topk_idx carries PHYSICAL slot ids (post-EPLB placement); all
        group bookkeeping below runs over the P = E + R physical slots.
        shared: optional (sgu, sdn) replicated shared-expert weights (SBO,
        see shared_expert_ffn) — computed inside the EP shard_map when the
        ragged-a2a path runs, added structurally otherwise."""
        T, H = x.shape
        E, K = self.num_physical, topk_idx.shape[-1]
        if (
            self.ep_size > 1
            and get_moe_a2a() == "ragged"
            and T % self.ep_size == 0
        ):
            w_gu, w_dn = self._expert_weights(params, prefix, x.dtype)
            if get_tbo() and T % (2 * self.ep_size) == 0 and T >= 2 * self.ep_size:
                # Two-batch overlap: two independent dispatch chains.
                h = T // 2
                out_a = self._experts_ep_a2a(
                    x[:h], topk_weights[:h], topk_idx[:h], w_gu, w_dn,
                    shared=shared,
                )
                out_b = self._experts_ep_a2a(
                    x[h:], topk_weights[h:], topk_idx[h:], w_gu, w_dn,
                    shared=shared,
                )
                return jnp.concatenate([out_a, out_b], axis=0).astype(x.dtype)
            return self._experts_ep_a2a(
                x, topk_weights, topk_idx, w_gu, w_dn, shared=shared
            ).astype(x.dtype)
        # Flatten (token, k) pairs and sort by expert for grouped GEMM.
        flat_expert = topk_idx.reshape(-1)  # [T*K]
        flat_weight = topk_weights.reshape(-1)  # [T*K]
        order = jnp.argsort(flat_expert)  # stable
        token_of = order // K  # source token per sorted slot
        x_sorted = x[token_of]  # [T*K, H]
        group_sizes = jnp.bincount(flat_expert, length=E).astype(jnp.int32)

        w_gu, w_dn = self._expert_weights(params, prefix, x.dtype)
        w_sorted = flat_weight[order][:, None]
        if self.scale_input:
            x_sorted = x_sorted * w_sorted.astype(x_sorted.dtype)
            w_sorted = jnp.ones_like(w_sorted)

        if self.ep_size > 1:
            out_sorted = self._experts_ep(
                x_sorted, group_sizes, w_gu, w_dn
            )
        else:
            out_sorted = self._grouped_ffn(x_sorted, group_sizes, w_gu, w_dn)
        out_sorted = out_sorted * w_sorted.astype(out_sorted.dtype)

        # Scatter-add back to tokens.
        out = jnp.zeros((T, H), out_sorted.dtype)
        out = out.at[token_of].add(out_sorted)
        if shared is not None:
            out = out + shared_expert_ffn(x, *shared).astype(out.dtype)
        return out.astype(x.dtype)

    def _experts_ep_a2a(self, x, topk_w, topk_i, w_gu, w_dn, shared=None):
        """Ragged all-to-all EP dispatch (ref token_dispatcher/deepep.py
        recast with jax.lax.ragged_all_to_all over the mesh axis).

        Each shard owns the T/ep token slice it is responsible for, sorts
        its (token, k) rows by expert, ships every destination shard
        exactly the rows that shard's experts own, runs the grouped GEMM
        over only the RECEIVED rows, and reverses the exchange. Traffic
        per shard = its sent + received rows; GEMM reads drop ep-fold vs
        the padded-groups formulation."""
        E, K = self.num_physical, topk_i.shape[-1]
        ep = self.ep_size
        El = E // ep
        T, H = x.shape
        Tl = T // ep
        TK = T * K  # worst-case recv capacity (all rows to one shard)
        ctx = get_mesh_context()

        def local(xl, ti, tw, gu, dn, *sh):
            me = jax.lax.axis_index(AXIS_TP)
            flat_e = ti.reshape(-1)  # [Tl*K]
            order = jnp.argsort(flat_e)
            tok_of = order // K
            xs = xl[tok_of]  # [Tl*K, H] expert-sorted
            if self.scale_input:
                xs = xs * tw.reshape(-1)[order][:, None].astype(xs.dtype)
            gs_e = jnp.bincount(flat_e, length=E).astype(jnp.int32)  # [E]
            send_sizes = gs_e.reshape(ep, El).sum(axis=1)  # [ep]
            csum = jnp.cumsum(send_sizes)
            input_offsets = (csum - send_sizes).astype(jnp.int32)
            # size exchange: sizes_mat[s, d] = rows s sends to d
            sizes_mat = jax.lax.all_gather(send_sizes, AXIS_TP)  # [ep, ep]
            gs_mat = jax.lax.all_gather(gs_e, AXIS_TP)  # [ep, E]
            recv_sizes = sizes_mat[:, me]  # [ep] rows from each sender
            # where MY slice to d starts on d: senders before me, same d
            output_offsets = (jnp.cumsum(sizes_mat, axis=0) - sizes_mat)[me]
            buf = jnp.zeros((TK, H), xs.dtype)
            recv = _ragged_a2a(
                xs, buf, input_offsets, send_sizes.astype(jnp.int32),
                output_offsets.astype(jnp.int32),
                recv_sizes.astype(jnp.int32), AXIS_TP,
            )  # [TK, H]: sender-major, expert-sorted within each sender
            # Reconstruct each received row's LOCAL expert from the counts
            # (no ids on the wire): flat group g = (sender, local expert).
            cnts = jax.lax.dynamic_slice_in_dim(
                gs_mat, me * El, El, axis=1
            ).reshape(-1)  # [ep*El]
            bounds = jnp.cumsum(cnts)
            rix = jnp.arange(TK, dtype=jnp.int32)
            g = jnp.searchsorted(bounds, rix, side="right")  # [TK]
            loc_e = jnp.where(g < ep * El, g % El, El)  # El = padding group
            order2 = jnp.argsort(loc_e)  # stable: resort by local expert
            xs2 = recv[order2]
            gs_local = jnp.concatenate(
                [
                    cnts.reshape(ep, El).sum(axis=0),
                    (TK - bounds[-1])[None],  # padding rows -> zero expert
                ]
            ).astype(jnp.int32)
            zgu = jnp.zeros((1,) + gu.shape[1:], gu.dtype)
            zdn = jnp.zeros((1,) + dn.shape[1:], dn.dtype)
            out2 = self._grouped_ffn(
                xs2, gs_local,
                jnp.concatenate([gu, zgu], axis=0),
                jnp.concatenate([dn, zdn], axis=0),
            )  # [TK, H]
            inv2 = jnp.argsort(order2)
            out_recv = out2[inv2]  # back to sender-major layout
            # reverse exchange: return each sender its processed rows
            in_off_mat = jax.lax.all_gather(input_offsets, AXIS_TP)
            rcs = jnp.cumsum(recv_sizes)
            rev_in_off = (rcs - recv_sizes).astype(jnp.int32)
            back = _ragged_a2a(
                out_recv, jnp.zeros((Tl * K, H), out_recv.dtype),
                rev_in_off, recv_sizes.astype(jnp.int32),
                in_off_mat[:, me].astype(jnp.int32),
                send_sizes.astype(jnp.int32), AXIS_TP,
            )  # [Tl*K, H] in my expert-sorted order
            if self.scale_input:
                ws = jnp.ones((Tl * K, 1), jnp.float32)
            else:
                ws = tw.reshape(-1)[order][:, None]
            out_tok = jnp.zeros((Tl, H), back.dtype)
            out_tok = out_tok.at[tok_of].add(back * ws.astype(back.dtype))
            if sh:
                # SBO: shared-expert FFN on this shard's LOCAL rows — an
                # independent chain beside the a2a (overlapped by the
                # latency-hiding scheduler), no collective of its own.
                out_tok = out_tok + shared_expert_ffn(
                    xl, *sh
                ).astype(out_tok.dtype)
            return out_tok

        in_specs = [
            P(AXIS_TP, None), P(AXIS_TP, None), P(AXIS_TP, None),
            P(AXIS_TP, None, None, None), P(AXIS_TP, None, None),
        ]
        operands = [x, topk_i, topk_w.astype(jnp.float32), w_gu, w_dn]
        if shared is not None:
            in_specs += [P(None, None, None), P(None, None)]
            operands += list(shared)
        return jax.shard_map(
            local,
            mesh=ctx.mesh,
            in_specs=tuple(in_specs),
            out_specs=P(AXIS_TP, None),
            check_vma=False,
        )(*operands)

    def _experts_ep(self, x_sorted, group_sizes, w_gu, w_dn):
        """Expert-parallel grouped GEMM: each shard holds E/ep experts and
        processes the FULL sorted stream with zero-weight padding groups for
        the rows owned by other shards (their outputs are exactly zero —
        silu(0)*0 through zero down-weights), then psum combines shards."""
        E = self.num_physical
        ep = self.ep_size
        El = E // ep
        TK = x_sorted.shape[0]
        ctx = get_mesh_context()

        def local(xs, gs, gu, dn):
            # gu [El, H, 2, I]; dn [El, I, H] (this shard's experts)
            idx = jax.lax.axis_index(AXIS_TP)
            eids = jnp.arange(E, dtype=jnp.int32)
            n_before = jnp.sum(jnp.where(eids < idx * El, gs, 0))
            gs_local = jax.lax.dynamic_slice_in_dim(gs, idx * El, El)
            n_after = TK - n_before - jnp.sum(gs_local)
            gs_pad = jnp.concatenate(
                [n_before[None], gs_local, n_after[None]]
            ).astype(jnp.int32)
            zgu = jnp.zeros((1,) + gu.shape[1:], gu.dtype)
            zdn = jnp.zeros((1,) + dn.shape[1:], dn.dtype)
            gu_pad = jnp.concatenate([zgu, gu, zgu], axis=0)
            dn_pad = jnp.concatenate([zdn, dn, zdn], axis=0)
            out = self._grouped_ffn(xs, gs_pad, gu_pad, dn_pad)
            return jax.lax.psum(out, AXIS_TP)

        return jax.shard_map(
            local,
            mesh=ctx.mesh,
            in_specs=(P(), P(), P(AXIS_TP, None, None, None),
                      P(AXIS_TP, None, None)),
            out_specs=P(),
            check_vma=False,
        )(x_sorted, group_sizes, w_gu, w_dn)
