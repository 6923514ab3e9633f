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


def build_service(tm, server_args=None) -> grpc.GenericRpcHandler:
    import time as _t
    import uuid as _uuid

    from sglang_tpu.entrypoints.openai_api import OpenAIServing

    served = getattr(server_args, "served_model_name", None) or "model"
    serving = OpenAIServing(
        tm, served,
        tool_call_parser=getattr(server_args, "tool_call_parser", None),
    )
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
        labels = list(request.label_token_ids)
        seqs = []
        id_seqs = []
        if request.query_text:
            for it in request.item_texts:
                a, b = ((it, request.query_text) if request.item_first
                        else (request.query_text, it))
                seqs.append(a + b)
        elif request.query_ids:
            # Token-id scoring (mirrors Engine.score's input_ids path):
            # query_ids + per-item id lists, honoring item_first.
            q = list(request.query_ids)
            for it in request.item_ids:
                ids = list(it.ids)
                a, b = (ids, q) if request.item_first else (q, ids)
                id_seqs.append(a + b)
        gri = GenerateReqInput(
            text=seqs or None,
            input_ids=id_seqs or None,
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

    # ---- OpenAI-protocol passthrough rpcs (ref sglang.proto 24-29) ----
    async def chat_complete(request: pb.OpenAIRequest, context):
        body = json.loads(request.json or "{}")
        gri = serving.chat_to_gri(body)
        created = int(_t.time())
        if gri.stream:
            cid = f"chatcmpl-{_uuid.uuid4().hex}"
            sent: dict = {}
            first: dict = {}
            async for out in tm.generate_request(gri):
                idx = out.get("index", 0)
                delta = out["text"][sent.get(idx, 0):]
                sent[idx] = len(out["text"])
                fr = out["meta_info"]["finish_reason"]
                if delta or fr or first.get(idx, True):
                    chunk = serving.chat_stream_chunk(
                        body, delta, fr, created, cid,
                        first.get(idx, True), index=idx,
                    )
                    first[idx] = False
                    yield pb.OpenAIStreamChunk(json=json.dumps(chunk))
            return
        outs = [o async for o in tm.generate_request(gri)]
        yield pb.OpenAIStreamChunk(
            json=json.dumps(serving.chat_response(body, outs, created))
        )

    async def complete(request: pb.OpenAIRequest, context):
        body = json.loads(request.json or "{}")
        gri = serving.completions_to_gri(body)
        created = int(_t.time())
        if gri.stream:
            cid = f"cmpl-{_uuid.uuid4().hex}"
            sent: dict = {}
            async for out in tm.generate_request(gri):
                idx = out.get("index", 0)
                delta = out["text"][sent.get(idx, 0):]
                sent[idx] = len(out["text"])
                fr = out["meta_info"]["finish_reason"]
                if delta or fr:
                    chunk = serving.completion_stream_chunk(
                        body, delta, fr, created, cid, index=idx
                    )
                    yield pb.OpenAIStreamChunk(json=json.dumps(chunk))
            return
        outs = [o async for o in tm.generate_request(gri)]
        yield pb.OpenAIStreamChunk(
            json=json.dumps(serving.completion_response(body, outs, created))
        )

    async def _embed_outs(inp):
        if isinstance(inp, str) or (inp and isinstance(inp[0], int)):
            inp = [inp]
        texts = inp if inp and isinstance(inp[0], str) else None
        ids = inp if inp and isinstance(inp[0], list) else None
        gri = GenerateReqInput(
            text=(texts if texts and len(texts) > 1
                  else (texts[0] if texts else None)),
            input_ids=(ids if ids and len(ids) > 1
                       else (ids[0] if ids else None)),
            is_embedding=True,
        )
        return [o async for o in tm.generate_request(gri)]

    async def openai_embed(request: pb.OpenAIRequest, context):
        body = json.loads(request.json or "{}")
        outs = await _embed_outs(body.get("input"))
        total = sum(o["meta_info"].get("prompt_tokens", 0) for o in outs)
        return pb.OpenAIResponse(json=json.dumps({
            "object": "list",
            "data": [
                {"object": "embedding", "index": i,
                 "embedding": o["embedding"]}
                for i, o in enumerate(outs)
            ],
            "model": body.get("model", served),
            "usage": {"prompt_tokens": total, "total_tokens": total},
        }))

    async def rerank(request: pb.OpenAIRequest, context):
        body = json.loads(request.json or "{}")
        query = body.get("query")
        docs = list(body.get("documents") or [])
        outs = await _embed_outs([query] + docs)
        qv = outs[0]["embedding"]
        scores = [sum(a * b for a, b in zip(qv, o["embedding"]))
                  for o in outs[1:]]
        ranked = sorted(
            ({"index": i, "relevance_score": s,
              **({"document": docs[i]}
                 if body.get("return_documents", True) else {})}
             for i, s in enumerate(scores)),
            key=lambda r: -r["relevance_score"],
        )
        if body.get("top_n"):
            ranked = ranked[: int(body["top_n"])]
        return pb.OpenAIResponse(json=json.dumps({
            "model": body.get("model", served), "results": ranked,
        }))

    async def classify(request: pb.OpenAIRequest, context):
        body = json.loads(request.json or "{}")
        gri = GenerateReqInput(
            text=body.get("text"), input_ids=body.get("input_ids"),
            is_embedding=True,
        )
        outs = [o async for o in tm.generate_request(gri)]
        return pb.OpenAIResponse(json=json.dumps([
            {"embedding": o["embedding"], "meta_info": o["meta_info"]}
            for o in outs
        ]))

    async def list_models(request, context):
        return pb.ListModelsResponse(models=[served])

    async def start_profile(request: pb.StartProfileRequest, context):
        import jax

        out_dir = request.output_dir or "/tmp/sglang_tpu_profile"
        try:
            jax.profiler.start_trace(out_dir)
            return pb.StartProfileResponse(success=True, message=out_dir)
        except Exception as e:  # noqa: BLE001
            return pb.StartProfileResponse(success=False, message=str(e))

    async def stop_profile(request, context):
        import jax

        try:
            jax.profiler.stop_trace()
            return pb.StartProfileResponse(success=True)
        except Exception as e:  # noqa: BLE001
            return pb.StartProfileResponse(success=False, message=str(e))

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
        "TextEmbed": _uu(embed, pb.EmbedRequest, pb.EmbedResponse),
        "OpenAIEmbed": _uu(openai_embed, pb.OpenAIRequest, pb.OpenAIResponse),
        "Rerank": _uu(rerank, pb.OpenAIRequest, pb.OpenAIResponse),
        "Classify": _uu(classify, pb.OpenAIRequest, pb.OpenAIResponse),
        "ListModels": _uu(list_models, pb.ListModelsRequest,
                          pb.ListModelsResponse),
        "StartProfile": _uu(start_profile, pb.StartProfileRequest,
                            pb.StartProfileResponse),
        "StopProfile": _uu(stop_profile, pb.StopProfileRequest,
                           pb.StartProfileResponse),
    })

    def _us(fn, req_cls, resp_cls):
        return grpc.unary_stream_rpc_method_handler(
            fn,
            request_deserializer=req_cls.FromString,
            response_serializer=resp_cls.SerializeToString,
        )

    handlers.update({
        "TextGenerate": _us(generate, pb.GenerateRequest,
                            pb.GenerateResponse),
        "ChatComplete": _us(chat_complete, pb.OpenAIRequest,
                            pb.OpenAIStreamChunk),
        "Complete": _us(complete, pb.OpenAIRequest, pb.OpenAIStreamChunk),
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
    server.add_generic_rpc_handlers((build_service(tm, server_args),))
    server.add_insecure_port(f"{server_args.host}:{grpc_port}")
    await server.start()
    logger.info("grpc server on %s:%d", server_args.host, grpc_port)
    await server.wait_for_termination()
