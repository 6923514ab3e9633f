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
