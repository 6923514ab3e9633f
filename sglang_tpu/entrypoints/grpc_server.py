"""gRPC server (asyncio).

Ref: srt/entrypoints/grpc_server.py:156 (serve_grpc) + proto rpc surface
(proto/sglang/runtime/v1/sglang.proto). The image has no grpc_tools
protoc plugin, so the service is registered with generic method handlers
over protoc-generated messages (proto/sglang_tpu.proto ->
entrypoints/grpc_gen/sglang_tpu_pb2.py).
"""

from __future__ import annotations

import json
import logging
import os
import sys

import grpc

_GEN = os.path.join(os.path.dirname(__file__), "grpc_gen")
if _GEN not in sys.path:
    sys.path.insert(0, _GEN)
import sglang_tpu_pb2 as pb  # noqa: E402

from sglang_tpu.managers.io_struct import GenerateReqInput  # noqa: E402

logger = logging.getLogger(__name__)

_SERVICE = "sglang_tpu.v1.SglangTpu"


def _sp_to_dict(sp: pb.SamplingParams) -> dict:
    d = {
        "max_new_tokens": sp.max_new_tokens or 128,
        "temperature": sp.temperature,
        "top_p": sp.top_p or 1.0,
        "top_k": sp.top_k or -1,
        "min_p": sp.min_p,
        "ignore_eos": sp.ignore_eos,
        "frequency_penalty": sp.frequency_penalty,
        "presence_penalty": sp.presence_penalty,
        "repetition_penalty": sp.repetition_penalty or 1.0,
    }
    if sp.stop:
        d["stop"] = list(sp.stop)
    if sp.stop_token_ids:
        d["stop_token_ids"] = list(sp.stop_token_ids)
    if sp.regex:
        d["regex"] = sp.regex
    if sp.json_schema:
        d["json_schema"] = sp.json_schema
    if sp.seed:
        d["sampling_seed"] = sp.seed
    return d


def build_service(tm) -> grpc.GenericRpcHandler:
    async def generate(request: pb.GenerateRequest, context):
        gri = GenerateReqInput(
            text=request.text or None,
            input_ids=list(request.input_ids) or None,
            sampling_params=_sp_to_dict(request.sampling_params),
            rid=request.rid or None,
            return_logprob=request.return_logprob,
            stream=True,
            lora_path=request.lora_id or None,
        )
        async for out in tm.generate_request(gri):
            meta = out["meta_info"]
            fr = meta.get("finish_reason")
            yield pb.GenerateResponse(
                rid=meta.get("id", ""),
                text=out["text"],
                output_ids=out["output_ids"],
                finish_reason=(fr or {}).get("type", "") if fr else "",
                prompt_tokens=meta.get("prompt_tokens", 0),
                completion_tokens=meta.get("completion_tokens", 0),
                cached_tokens=meta.get("cached_tokens", 0),
            )

    async def embed(request: pb.EmbedRequest, context):
        gri = GenerateReqInput(
            text=request.text or None,
            input_ids=list(request.input_ids) or None,
            is_embedding=True,
        )
        out = None
        async for o in tm.generate_request(gri):
            out = o
        return pb.EmbedResponse(
            embedding=out["embedding"],
            prompt_tokens=out["meta_info"].get("prompt_tokens", 0),
        )

    async def health(request, context):
        return pb.HealthCheckResponse(ok=await tm.health())

    async def flush(request, context):
        return pb.FlushCacheResponse(success=await tm.flush_cache())

    async def server_info(request, context):
        info = await tm.get_server_info()
        return pb.ServerInfoResponse(json=json.dumps(info))

    async def abort(request: pb.AbortRequest, context):
        await tm.abort_request(request.rid)
        return pb.AbortResponse(success=True)

    async def tokenize(request: pb.TokenizeRequest, context):
        ids = tm.tokenizer.encode(request.text)
        return pb.TokenizeResponse(input_ids=ids)

    async def detokenize(request: pb.DetokenizeRequest, context):
        text = tm.tokenizer.decode(
            list(request.input_ids),
            skip_special_tokens=request.skip_special_tokens,
        )
        return pb.DetokenizeResponse(text=text)

    async def model_info(request, context):
        info = await tm.get_server_info()
        return pb.GetModelInfoResponse(json=json.dumps({
            "model_path": info.get("model_path", ""),
            "max_total_tokens": info.get("max_total_tokens", 0),
        }))

    async def get_load(request, context):
        info = await tm.get_server_info()
        return pb.GetLoadResponse(
            running_requests=int(info.get("running_requests", 0)),
            waiting_requests=int(info.get("waiting_requests", 0)),
            token_usage=float(info.get("token_usage", 0.0)),
        )

    async def pause(request, context):
        return pb.PauseGenerationResponse(
            success=await tm.pause_generation(True)
        )

    async def cont(request, context):
        return pb.ContinueGenerationResponse(
            success=await tm.pause_generation(False)
        )

    async def update_weights(request: pb.UpdateWeightsRequest, context):
        ok, msg = await tm.update_weights_from_disk(
            request.model_path, request.load_format or "auto"
        )
        return pb.UpdateWeightsResponse(success=ok, message=msg)

    async def score(request: pb.ScoreRequest, context):
        items = list(request.item_texts)
        labels = list(request.label_token_ids)
        seqs = []
        for it in items:
            if request.query_text:
                a, b = ((it, request.query_text) if request.item_first
                        else (request.query_text, it))
                seqs.append(a + b)
        gri = GenerateReqInput(
            text=seqs or None,
            is_embedding=True,
            label_token_ids=labels,
        )
        rows = []
        async for o in tm.generate_request(gri):
            p = list(o["embedding"])
            if request.apply_softmax:
                ssum = sum(p) or 1.0
                p = [x / ssum for x in p]
            rows.append(pb.ScoreResponse.Row(scores=p))
        return pb.ScoreResponse(rows=rows)

    async def load_lora(request: pb.LoadLoraRequest, context):
        ok, msg, _ = await tm.load_lora_adapter(
            request.lora_name, request.lora_path
        )
        return pb.LoadLoraResponse(success=ok, message=msg)

    async def unload_lora(request: pb.UnloadLoraRequest, context):
        ok, msg, _ = await tm.unload_lora_adapter(request.lora_name)
        return pb.LoadLoraResponse(success=ok, message=msg)

    handlers = {
        "Generate": grpc.unary_stream_rpc_method_handler(
            generate,
            request_deserializer=pb.GenerateRequest.FromString,
            response_serializer=pb.GenerateResponse.SerializeToString,
        ),
        "Embed": grpc.unary_unary_rpc_method_handler(
            embed,
            request_deserializer=pb.EmbedRequest.FromString,
            response_serializer=pb.EmbedResponse.SerializeToString,
        ),
        "HealthCheck": grpc.unary_unary_rpc_method_handler(
            health,
            request_deserializer=pb.HealthCheckRequest.FromString,
            response_serializer=pb.HealthCheckResponse.SerializeToString,
        ),
        "FlushCache": grpc.unary_unary_rpc_method_handler(
            flush,
            request_deserializer=pb.FlushCacheRequest.FromString,
            response_serializer=pb.FlushCacheResponse.SerializeToString,
        ),
        "GetServerInfo": grpc.unary_unary_rpc_method_handler(
            server_info,
            request_deserializer=pb.ServerInfoRequest.FromString,
            response_serializer=pb.ServerInfoResponse.SerializeToString,
        ),
        "Abort": grpc.unary_unary_rpc_method_handler(
            abort,
            request_deserializer=pb.AbortRequest.FromString,
            response_serializer=pb.AbortResponse.SerializeToString,
        ),
    }

    def _uu(fn, req_cls, resp_cls):
        return grpc.unary_unary_rpc_method_handler(
            fn,
            request_deserializer=req_cls.FromString,
            response_serializer=resp_cls.SerializeToString,
        )

    handlers.update({
        "Tokenize": _uu(tokenize, pb.TokenizeRequest, pb.TokenizeResponse),
        "Detokenize": _uu(detokenize, pb.DetokenizeRequest,
                          pb.DetokenizeResponse),
        "GetModelInfo": _uu(model_info, pb.GetModelInfoRequest,
                            pb.GetModelInfoResponse),
        "GetLoad": _uu(get_load, pb.GetLoadRequest, pb.GetLoadResponse),
        "PauseGeneration": _uu(pause, pb.PauseGenerationRequest,
                               pb.PauseGenerationResponse),
        "ContinueGeneration": _uu(cont, pb.ContinueGenerationRequest,
                                  pb.ContinueGenerationResponse),
        "UpdateWeightsFromDisk": _uu(update_weights, pb.UpdateWeightsRequest,
                                     pb.UpdateWeightsResponse),
        "Score": _uu(score, pb.ScoreRequest, pb.ScoreResponse),
        "LoadLoraAdapter": _uu(load_lora, pb.LoadLoraRequest,
                               pb.LoadLoraResponse),
        "UnloadLoraAdapter": _uu(unload_lora, pb.UnloadLoraRequest,
                                 pb.LoadLoraResponse),
    })
    return grpc.method_handlers_generic_handler(_SERVICE, handlers)


async def serve_grpc(server_args, grpc_port: int):
    """Launch managers + grpc front (instead of, or beside, HTTP)."""
    import time as _time

    from sglang_tpu.entrypoints.engine import launch_managers
    from sglang_tpu.managers.tokenizer_manager import TokenizerManager

    port_args, workers, deferred = launch_managers(server_args)
    tm = TokenizerManager(server_args, port_args)
    tm.start()
    if deferred:
        for i, t in enumerate(deferred):
            t.start()
            if i == 0:
                _time.sleep(0.05)
    await tm.wait_ready()

    server = grpc.aio.server()
    server.add_generic_rpc_handlers((build_service(tm),))
    server.add_insecure_port(f"{server_args.host}:{grpc_port}")
    await server.start()
    logger.info("grpc server on %s:%d", server_args.host, grpc_port)
    await server.wait_for_termination()
