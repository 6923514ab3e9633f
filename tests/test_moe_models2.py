"""Greedy parity vs HF for the round-3 MoE model sweep:
OLMoE, DBRX, GLM-4.5 (Glm4Moe), GraniteMoE.
Ref test strategy: SURVEY.md §4 (token-identical greedy vs HF through
the full scheduler)."""

from tests.test_model_zoo2 import COMMON, _check, _save


def test_olmoe_parity(tmp_path_factory):
    import torch
    from transformers import OlmoeConfig, OlmoeForCausalLM

    torch.manual_seed(30)
    cfg = OlmoeConfig(**COMMON, num_experts=8, num_experts_per_tok=2,
                      norm_topk_prob=False)
    _check(_save(tmp_path_factory, "tiny_olmoe", OlmoeForCausalLM(cfg)))


def test_olmoe_parity_norm_topk(tmp_path_factory):
    import torch
    from transformers import OlmoeConfig, OlmoeForCausalLM

    torch.manual_seed(31)
    cfg = OlmoeConfig(**COMMON, num_experts=8, num_experts_per_tok=2,
                      norm_topk_prob=True)
    _check(_save(tmp_path_factory, "tiny_olmoe_nt", OlmoeForCausalLM(cfg)),
           stride=7)


def test_dbrx_parity(tmp_path_factory):
    import torch
    from transformers import DbrxConfig, DbrxForCausalLM

    torch.manual_seed(32)
    cfg = DbrxConfig(
        d_model=64, n_heads=4, n_layers=2, max_seq_len=256, vocab_size=128,
        attn_config={"kv_n_heads": 2, "clip_qkv": 8.0,
                     "rope_theta": 10000.0},
        ffn_config={"ffn_hidden_size": 96, "moe_num_experts": 8,
                    "moe_top_k": 2},
        pad_token_id=0,
    )
    _check(_save(tmp_path_factory, "tiny_dbrx", DbrxForCausalLM(cfg)))


def test_glm4_moe_parity(tmp_path_factory):
    import torch
    from transformers import Glm4MoeConfig, Glm4MoeForCausalLM

    torch.manual_seed(33)
    cfg = dict(COMMON)
    cfg["num_hidden_layers"] = 3  # 1 dense + 2 MoE
    cfg = Glm4MoeConfig(
        **cfg, head_dim=16, partial_rotary_factor=0.5, use_qk_norm=True,
        n_routed_experts=8, num_experts_per_tok=2, moe_intermediate_size=48,
        n_shared_experts=1, n_group=2, topk_group=1, norm_topk_prob=True,
        routed_scaling_factor=1.5, first_k_dense_replace=1,
    )
    model = Glm4MoeForCausalLM(cfg)
    # exercise a non-zero correction bias (checkpoints ship trained ones)
    with torch.no_grad():
        for layer in model.model.layers[1:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.2, 0.2)
    _check(_save(tmp_path_factory, "tiny_glm4moe", model), stride=9)


def test_granite_moe_parity(tmp_path_factory):
    import torch
    from transformers import GraniteMoeConfig, GraniteMoeForCausalLM

    torch.manual_seed(34)
    cfg = GraniteMoeConfig(
        **COMMON, num_local_experts=8, num_experts_per_tok=2,
        embedding_multiplier=6.0, attention_multiplier=0.12,
        residual_multiplier=0.25, logits_scaling=4.0,
    )
    _check(_save(tmp_path_factory, "tiny_granitemoe",
                 GraniteMoeForCausalLM(cfg)), stride=11)
