"""gRPC service e2e (generic handlers over protoc-generated messages)."""

import asyncio
import os
import sys
import threading

import grpc
import pytest

_GEN = os.path.join(
    os.path.dirname(os.path.dirname(__file__)),
    "sglang_tpu", "entrypoints", "grpc_gen",
)
sys.path.insert(0, _GEN)
import sglang_tpu_pb2 as pb  # noqa: E402


@pytest.fixture(scope="module")
def grpc_addr(tiny_llama_dir):
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.entrypoints.grpc_server import build_service
    from sglang_tpu.utils import find_free_port

    eng = Engine(
        model_path=tiny_llama_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=2048,
        enable_single_process=True,
        log_level="warning",
    )
    port = find_free_port()
    started = threading.Event()

    async def run():
        server = grpc.aio.server()
        server.add_generic_rpc_handlers(
            (build_service(eng.tokenizer_manager, eng.server_args),)
        )
        server.add_insecure_port(f"127.0.0.1:{port}")
        await server.start()
        started.set()
        await server.wait_for_termination()

    # run the grpc server on the ENGINE's loop (same asyncio context as TM)
    asyncio.run_coroutine_threadsafe(run(), eng._loop)
    started.wait(30)
    yield f"127.0.0.1:{port}"
    eng.shutdown()


def _call(addr, method, req, resp_cls, stream=False):
    ch = grpc.insecure_channel(addr)
    path = f"/sglang_tpu.v1.SglangTpu/{method}"
    if stream:
        fn = ch.unary_stream(
            path, request_serializer=req.__class__.SerializeToString,
            response_deserializer=resp_cls.FromString,
        )
        return list(fn(req, timeout=120))
    fn = ch.unary_unary(
        path, request_serializer=req.__class__.SerializeToString,
        response_deserializer=resp_cls.FromString,
    )
    return fn(req, timeout=120)


def test_grpc_health(grpc_addr):
    resp = _call(grpc_addr, "HealthCheck", pb.HealthCheckRequest(),
                 pb.HealthCheckResponse)
    assert resp.ok


def test_grpc_generate_stream(grpc_addr):
    req = pb.GenerateRequest(
        text="w10 w11 w12",
        sampling_params=pb.SamplingParams(
            max_new_tokens=5, temperature=0.0, ignore_eos=True
        ),
    )
    chunks = _call(grpc_addr, "Generate", req, pb.GenerateResponse, stream=True)
    assert chunks
    assert chunks[-1].finish_reason == "length"
    assert chunks[-1].completion_tokens == 5


def test_grpc_embed_and_info(grpc_addr):
    resp = _call(grpc_addr, "Embed", pb.EmbedRequest(text="w20 w21"),
                 pb.EmbedResponse)
    assert len(resp.embedding) == 64  # tiny model hidden size
    info = _call(grpc_addr, "GetServerInfo", pb.ServerInfoRequest(),
                 pb.ServerInfoResponse)
    assert "max_total_tokens" in info.json


def test_grpc_round2_surface(grpc_addr):
    """Tokenize/Detokenize/GetLoad/GetModelInfo/Pause/Continue/Score
    (round-2 rpc additions; ref sglang.proto rpcs 6-40)."""
    tk = _call(grpc_addr, "Tokenize", pb.TokenizeRequest(text="w10 w11"),
               pb.TokenizeResponse)
    assert len(tk.input_ids) >= 2
    dt = _call(grpc_addr, "Detokenize",
               pb.DetokenizeRequest(input_ids=tk.input_ids,
                                    skip_special_tokens=True),
               pb.DetokenizeResponse)
    assert "w10" in dt.text
    mi = _call(grpc_addr, "GetModelInfo", pb.GetModelInfoRequest(),
               pb.GetModelInfoResponse)
    assert "model_path" in mi.json
    load = _call(grpc_addr, "GetLoad", pb.GetLoadRequest(),
                 pb.GetLoadResponse)
    assert load.running_requests >= 0
    assert _call(grpc_addr, "PauseGeneration",
                 pb.PauseGenerationRequest(),
                 pb.PauseGenerationResponse).success
    assert _call(grpc_addr, "ContinueGeneration",
                 pb.ContinueGenerationRequest(),
                 pb.ContinueGenerationResponse).success
    sc = _call(grpc_addr, "Score",
               pb.ScoreRequest(query_text="w10 ", item_texts=["w11", "w12"],
                               label_token_ids=[5, 6, 7],
                               apply_softmax=True),
               pb.ScoreResponse)
    assert len(sc.rows) == 2
    for row in sc.rows:
        assert len(row.scores) == 3
        assert abs(sum(row.scores) - 1.0) < 1e-4
    # token-id scoring path: query_ids + item_ids (no query_text)
    sci = _call(grpc_addr, "Score",
                pb.ScoreRequest(
                    query_ids=[10, 11],
                    item_ids=[pb.ScoreRequest.IdList(ids=[12]),
                              pb.ScoreRequest.IdList(ids=[13, 14])],
                    label_token_ids=[5, 6, 7],
                    apply_softmax=True),
                pb.ScoreResponse)
    assert len(sci.rows) == 2
    for row in sci.rows:
        assert len(row.scores) == 3
        assert abs(sum(row.scores) - 1.0) < 1e-4


def test_grpc_round3_openai_surface(grpc_addr):
    """ChatComplete/Complete/OpenAIEmbed/Rerank/ListModels/Profile rpcs
    (round-3 additions; ref sglang.proto rpcs 16-34)."""
    import json

    lm = _call(grpc_addr, "ListModels", pb.ListModelsRequest(),
               pb.ListModelsResponse)
    assert len(lm.models) == 1

    body = {"prompt": "w10 w11", "max_tokens": 4}
    chunks = _call(grpc_addr, "Complete", pb.OpenAIRequest(json=json.dumps(body)),
                   pb.OpenAIStreamChunk, stream=True)
    resp = json.loads(chunks[-1].json)
    assert resp["object"] == "text_completion"
    assert resp["choices"][0]["text"]

    body = {"messages": [{"role": "user", "content": "w10 w11"}],
            "max_tokens": 4, "stream": True}
    chunks = _call(grpc_addr, "ChatComplete",
                   pb.OpenAIRequest(json=json.dumps(body)),
                   pb.OpenAIStreamChunk, stream=True)
    assert chunks
    first = json.loads(chunks[0].json)
    assert first["object"] == "chat.completion.chunk"

    pr = _call(grpc_addr, "StartProfile",
               pb.StartProfileRequest(output_dir="/tmp/sgl_tpu_grpc_prof"),
               pb.StartProfileResponse)
    _call(grpc_addr, "StopProfile", pb.StopProfileRequest(),
          pb.StartProfileResponse)

    # text aliases
    gens = _call(grpc_addr, "TextGenerate",
                 pb.GenerateRequest(text="w10 w11",
                                    sampling_params=pb.SamplingParams(
                                        max_new_tokens=3, temperature=0.0)),
                 pb.GenerateResponse, stream=True)
    assert gens and gens[-1].completion_tokens >= 1
