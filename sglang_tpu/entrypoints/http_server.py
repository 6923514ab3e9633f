"""HTTP server (aiohttp): native + OpenAI-compatible endpoints.

Ref: srt/entrypoints/http_server.py — endpoint parity targets listed in
SURVEY.md §2.1 (/generate:869, /health:646, /get_model_info:723,
/get_server_info:771, /flush_cache:946, /update_weights_from_disk:1215,
/abort_request:1587, /v1/completions:1694, /v1/chat/completions:1702,
/v1/models:1823). FastAPI isn't in this image; aiohttp serves the same
surface.
"""

from __future__ import annotations

import asyncio
import json
import logging
import time
import uuid
from typing import Dict, Optional

from aiohttp import web

from sglang_tpu.entrypoints.openai_api import OpenAIServing, _finish_reason_str
from sglang_tpu.managers.io_struct import GenerateReqInput
from sglang_tpu.server_args import ServerArgs
from sglang_tpu.utils import configure_logger

logger = logging.getLogger(__name__)


def _json_error(message: str, status: int = 400) -> web.Response:
    return web.json_response(
        {"error": {"message": message, "type": "invalid_request_error"}},
        status=status,
    )


def _sse(data) -> bytes:
    if isinstance(data, str):
        return f"data: {data}\n\n".encode()
    return f"data: {json.dumps(data, ensure_ascii=False)}\n\n".encode()


class HttpServer:
    def __init__(self, server_args: ServerArgs, tokenizer_manager):
        self.args = server_args
        self.tm = tokenizer_manager
        self.metrics = None
        if server_args.enable_metrics:
            from sglang_tpu.observability.metrics import TokenizerMetrics

            self.metrics = TokenizerMetrics(server_args.served_model_name)
            tokenizer_manager.metrics = self.metrics
        self.openai = OpenAIServing(
            tokenizer_manager,
            server_args.served_model_name,
            tool_call_parser=server_args.tool_call_parser,
            reasoning_parser=server_args.reasoning_parser,
        )
        self.start_time = time.time()

    # ------------------------------------------------------------ native API
    async def health(self, request: web.Request) -> web.Response:
        return web.Response(text="ok")

    async def health_generate(self, request: web.Request) -> web.Response:
        gri = GenerateReqInput(
            input_ids=[1], sampling_params={"max_new_tokens": 1, "temperature": 0}
        )
        try:
            async for _ in self.tm.generate_request(gri):
                pass
            return web.Response(text="ok")
        except Exception as e:  # noqa: BLE001
            return web.Response(text=f"unhealthy: {e}", status=503)

    async def get_model_info(self, request: web.Request) -> web.Response:
        return web.json_response(
            {
                "model_path": self.args.model_path,
                "tokenizer_path": self.args.tokenizer_path,
                "served_model_name": self.args.served_model_name,
                "is_generation": True,
            }
        )

    async def get_server_info(self, request: web.Request) -> web.Response:
        info = await self.tm.get_server_info()
        info.update(
            {
                "version": "0.1.0",
                "uptime": time.time() - self.start_time,
                "tp_size": self.args.tp_size,
                "dp_size": self.args.dp_size,
                "page_size": self.args.page_size,
                "schedule_policy": self.args.schedule_policy,
            }
        )
        return web.json_response(info)

    async def generate(self, request: web.Request) -> web.StreamResponse:
        try:
            body = await request.json()
        except Exception:
            return _json_error("invalid JSON body")
        try:
            gri = GenerateReqInput(
                text=body.get("text"),
                input_ids=body.get("input_ids"),
                sampling_params=body.get("sampling_params"),
                rid=body.get("rid"),
                return_logprob=body.get("return_logprob", False),
                top_logprobs_num=body.get("top_logprobs_num", 0),
                return_text_in_logprobs=body.get(
                    "return_text_in_logprobs", False
                ),
                stream=body.get("stream", False),
                lora_path=body.get("lora_path"),
                input_embeds=body.get("input_embeds"),
                priority=body.get("priority", 0),
                session_params=body.get("session_params"),
                image_data=body.get("image_data"),
                audio_data=body.get("audio_data"),
                bootstrap_room=body.get("bootstrap_room"),
            )
        except Exception as e:  # noqa: BLE001
            return _json_error(str(e))

        if gri.stream:
            resp = web.StreamResponse(
                headers={
                    "Content-Type": "text/event-stream",
                    "Cache-Control": "no-cache",
                }
            )
            await resp.prepare(request)
            try:
                async for out in self.tm.generate_request(gri):
                    await resp.write(_sse(out))
                await resp.write(_sse("[DONE]"))
            except Exception as e:  # noqa: BLE001
                await resp.write(_sse({"error": str(e)}))
            return resp
        try:
            outs = []
            async for out in self.tm.generate_request(gri):
                outs.append(out)
            result = outs if gri.is_batch() else outs[-1]
            return web.json_response(result)
        except ValueError as e:
            return _json_error(str(e))

    async def encode(self, request: web.Request) -> web.Response:
        body = await request.json()
        gri = GenerateReqInput(
            text=body.get("text"),
            input_ids=body.get("input_ids"),
            is_embedding=True,
        )
        outs = []
        async for out in self.tm.generate_request(gri):
            outs.append(out)
        return web.json_response(outs if gri.is_batch() else outs[-1])

    async def v1_embeddings(self, request: web.Request) -> web.Response:
        body = await request.json()
        inp = body.get("input")
        if isinstance(inp, str) or (inp and isinstance(inp[0], int)):
            texts = [inp] if isinstance(inp, str) else None
            ids = None if isinstance(inp, str) else [inp]
        else:
            texts = inp if inp and isinstance(inp[0], str) else None
            ids = inp if inp and isinstance(inp[0], list) else None
        gri = GenerateReqInput(
            text=(texts if texts and len(texts) > 1 else (texts[0] if texts else None)),
            input_ids=(ids if ids and len(ids) > 1 else (ids[0] if ids else None)),
            is_embedding=True,
        )
        outs = []
        async for out in self.tm.generate_request(gri):
            outs.append(out)
        data = [
            {"object": "embedding", "index": i, "embedding": o["embedding"]}
            for i, o in enumerate(outs)
        ]
        total = sum(o["meta_info"].get("prompt_tokens", 0) for o in outs)
        return web.json_response(
            {
                "object": "list",
                "data": data,
                "model": body.get("model", self.args.served_model_name),
                "usage": {"prompt_tokens": total, "total_tokens": total},
            }
        )

    async def v1_rerank(self, request: web.Request) -> web.Response:
        """Bi-encoder rerank (ref /v1/rerank, srt http_server.py): embed the
        query and each document through the pooled-embedding path and rank
        by cosine similarity (embeddings are L2-normed already)."""
        body = await request.json()
        query = body.get("query")
        docs = list(body.get("documents") or [])
        if not query or not docs:
            return _json_error("query and documents are required")
        gri = GenerateReqInput(text=[query] + docs, is_embedding=True)
        outs = []
        async for out in self.tm.generate_request(gri):
            outs.append(out)
        qv = outs[0]["embedding"]
        scores = [
            sum(a * b for a, b in zip(qv, o["embedding"])) for o in outs[1:]
        ]
        ranked = sorted(
            (
                {"index": i, "relevance_score": s,
                 **({"document": docs[i]}
                    if body.get("return_documents", True) else {})}
                for i, s in enumerate(scores)
            ),
            key=lambda r: -r["relevance_score"],
        )
        top_n = body.get("top_n")
        if top_n:
            ranked = ranked[: int(top_n)]
        return web.json_response({
            "model": body.get("model", self.args.served_model_name),
            "results": ranked,
        })

    async def start_profile(self, request: web.Request) -> web.Response:
        """jax.profiler trace (Perfetto-compatible); ref /start_profile:1137."""
        import jax

        body = {}
        if request.can_read_body:
            try:
                body = await request.json()
            except Exception:  # noqa: BLE001
                body = {}
        out_dir = body.get("output_dir", "/tmp/sglang_tpu_profile")
        try:
            jax.profiler.start_trace(out_dir)
            self._profile_dir = out_dir
            return web.json_response({"success": True, "output_dir": out_dir})
        except Exception as e:  # noqa: BLE001
            return web.json_response({"success": False, "message": str(e)},
                                     status=500)

    async def stop_profile(self, request: web.Request) -> web.Response:
        import jax

        try:
            jax.profiler.stop_trace()
            return web.json_response(
                {"success": True,
                 "output_dir": getattr(self, "_profile_dir", None)}
            )
        except Exception as e:  # noqa: BLE001
            return web.json_response({"success": False, "message": str(e)},
                                     status=500)

    async def open_session(self, request: web.Request) -> web.Response:
        body = await request.json() if request.can_read_body else {}
        sid = self.tm.open_session(body.get("session_id"),
                                   timeout=body.get("timeout"))
        return web.json_response({"session_id": sid})

    async def session_tree(self, request: web.Request) -> web.Response:
        body = await request.json()
        tree = self.tm.get_session_tree(body.get("session_id", ""))
        if tree is None:
            return _json_error("unknown session", status=404)
        return web.json_response({"tree": tree})

    async def close_session(self, request: web.Request) -> web.Response:
        body = await request.json()
        ok = self.tm.close_session(body.get("session_id", ""))
        return web.json_response({"success": ok})

    async def flush_cache(self, request: web.Request) -> web.Response:
        ok = await self.tm.flush_cache()
        return web.json_response({"success": ok}, status=200 if ok else 400)

    async def v1_score(self, request: web.Request) -> web.Response:
        """Next-token label scoring (ref /v1/score, openai/serving_score.py):
        for each item, run query+item (or item+query) and return the
        probabilities of label_token_ids at the next-token position."""
        body = await request.json()
        query = body.get("query")
        items = body.get("items")
        labels = body.get("label_token_ids")
        if query is None or items is None or not labels:
            return _json_error("query, items and label_token_ids required")
        if isinstance(items, (str,)) or (
            items and isinstance(items[0], int)
        ):
            items = [items]
        item_first = bool(body.get("item_first", False))
        tok = self.tm.tokenizer
        seqs = []
        for it in items:
            if isinstance(query, str):
                a, b = (it, query) if item_first else (query, it)
                seqs.append(a + b)
            else:
                itt = it if isinstance(it, list) else [it]
                a, b = (itt, query) if item_first else (query, itt)
                seqs.append(list(a) + list(b))
        kw = {"text": seqs} if isinstance(seqs[0], str) else {
            "input_ids": seqs
        }
        gri = GenerateReqInput(
            is_embedding=True, label_token_ids=list(labels), **kw
        )
        outs = []
        async for out in self.tm.generate_request(gri):
            outs.append(out)
        scores = []
        for o in outs:
            p = list(o["embedding"])
            if body.get("apply_softmax"):
                s = sum(p) or 1.0
                p = [x / s for x in p]
            scores.append(p)
        return web.json_response({
            "object": "scoring",
            "model": body.get("model", self.args.served_model_name),
            "scores": scores,
            "usage": {
                "prompt_tokens": sum(o["meta_info"]["prompt_tokens"]
                                     for o in outs),
                "total_tokens": sum(o["meta_info"]["prompt_tokens"]
                                    for o in outs),
            },
        })

    async def classify(self, request: web.Request) -> web.Response:
        """Sequence classification / reward models (ref /classify:
        srt/entrypoints/http_server.py): returns the classifier head's
        logits per input."""
        body = await request.json()
        text = body.get("text")
        input_ids = body.get("input_ids")
        gri = GenerateReqInput(
            text=text, input_ids=input_ids, is_embedding=True
        )
        outs = []
        async for out in self.tm.generate_request(gri):
            outs.append(out)
        return web.json_response([
            {
                "embedding": o["embedding"],
                "meta_info": o["meta_info"],
            }
            for o in outs
        ])

    async def parse_function_call(self, request: web.Request) -> web.Response:
        """Post-hoc tool-call parse of generated text (ref
        /parse_function_call http_server.py:1953)."""
        from sglang_tpu.function_call.parser import FunctionCallParser

        body = await request.json()
        parser_name = body.get("tool_call_parser") or self.args.tool_call_parser
        if not parser_name:
            return _json_error("no tool_call_parser configured")
        parser = FunctionCallParser(body.get("tools") or [], parser_name)
        normal, calls = parser.parse_non_stream(body.get("text") or "")
        return web.json_response({
            "normal_text": normal,
            "calls": [
                {"name": c.name, "parameters": c.parameters,
                 "tool_index": c.tool_index}
                for c in calls
            ],
        })

    async def separate_reasoning(self, request: web.Request) -> web.Response:
        """Post-hoc reasoning split (ref /separate_reasoning)."""
        from sglang_tpu.parser.reasoning_parser import ReasoningParser

        body = await request.json()
        name = body.get("reasoning_parser") or self.args.reasoning_parser
        if not name:
            return _json_error("no reasoning_parser configured")
        r = ReasoningParser(name).parse_non_stream(body.get("text") or "")
        return web.json_response({
            "reasoning_text": r.reasoning_text or "",
            "text": r.normal_text or "",
        })

    async def init_weights_update_group(self, request: web.Request
                                        ) -> web.Response:
        body = await request.json()
        ok, message = await self.tm.init_weights_update_group(
            body.get("master_address") or body.get("group_addr", "")
        )
        return web.json_response(
            {"success": ok, "message": message}, status=200 if ok else 400
        )

    async def update_weights_from_distributed(self, request: web.Request
                                              ) -> web.Response:
        body = await request.json()
        ok, message = await self.tm.update_weights_from_distributed(
            body.get("names") or [], float(body.get("timeout", 120.0))
        )
        return web.json_response(
            {"success": ok, "message": message}, status=200 if ok else 400
        )

    async def pause_generation(self, request: web.Request) -> web.Response:
        ok = await self.tm.pause_generation(True)
        return web.json_response({"success": ok, "message": "paused"})

    async def continue_generation(self, request: web.Request) -> web.Response:
        ok = await self.tm.pause_generation(False)
        return web.json_response({"success": ok, "message": "resumed"})

    async def expert_distribution(self, request: web.Request) -> web.Response:
        action = request.match_info["action"]
        data = await self.tm.expert_distribution(action)
        out = {"success": True}
        if action == "dump":
            out["expert_distribution"] = data
        return web.json_response(out)

    async def eplb_rebalance(self, request: web.Request) -> web.Response:
        ok, message = await self.tm.eplb_rebalance()
        return web.json_response(
            {"success": ok, "message": message}, status=200 if ok else 400
        )

    async def elastic_ep(self, request: web.Request) -> web.Response:
        """POST {"dead_ranks": [..]} — elastic-EP scale event (ref
        srt/elastic_ep/elastic_ep.py): MoE routing excludes dead EP
        shards; [] restores full-width routing."""
        body = await request.json()
        dead = body.get("dead_ranks", [])
        ok, message = await self.tm.elastic_ep(dead)
        return web.json_response(
            {"success": ok, "message": message}, status=200 if ok else 400
        )

    async def abort_request(self, request: web.Request) -> web.Response:
        body = await request.json()
        await self.tm.abort_request(body.get("rid", ""))
        return web.json_response({"success": True})

    async def release_memory_occupation(self, request: web.Request):
        body = await request.json() if request.can_read_body else {}
        ok, msg = await self.tm.release_memory_occupation(body.get("tags"))
        return web.json_response({"success": ok, "message": msg})

    async def resume_memory_occupation(self, request: web.Request):
        body = await request.json() if request.can_read_body else {}
        ok, msg = await self.tm.resume_memory_occupation(body.get("tags"))
        return web.json_response({"success": ok, "message": msg})

    async def update_weights_from_disk(self, request: web.Request) -> web.Response:
        body = await request.json()
        ok, msg = await self.tm.update_weights_from_disk(
            body["model_path"], body.get("load_format", "auto")
        )
        return web.json_response({"success": ok, "message": msg})

    async def load_lora_adapter(self, request: web.Request) -> web.Response:
        """Dynamic LoRA load (ref http_server.py:1519)."""
        body = await request.json()
        ok, msg, loaded = await self.tm.load_lora_adapter(
            body["lora_name"], body["lora_path"]
        )
        return web.json_response(
            {"success": ok, "message": msg, "loaded_adapters": loaded},
            status=200 if ok else 400,
        )

    async def unload_lora_adapter(self, request: web.Request) -> web.Response:
        body = await request.json()
        ok, msg, loaded = await self.tm.unload_lora_adapter(body["lora_name"])
        return web.json_response(
            {"success": ok, "message": msg, "loaded_adapters": loaded},
            status=200 if ok else 400,
        )

    # ------------------------------------------------------------ OpenAI API
    async def metrics_endpoint(self, request: web.Request) -> web.Response:
        if self.metrics is None:
            return web.Response(text="metrics disabled (--enable-metrics)",
                                status=404)
        try:
            info = await self.tm.get_server_info()
            self.metrics.update_scheduler_stats(info)
        except Exception:  # noqa: BLE001
            pass
        return web.Response(
            body=self.metrics.render(),
            content_type="text/plain",
        )

    async def v1_models(self, request: web.Request) -> web.Response:
        return web.json_response(self.openai.models_response())

    async def v1_completions(self, request: web.Request) -> web.StreamResponse:
        try:
            body = await request.json()
            gri = self.openai.completions_to_gri(body)
        except ValueError as e:
            return _json_error(str(e))
        created = int(time.time())
        if gri.stream:
            cid = f"cmpl-{uuid.uuid4().hex}"
            resp = web.StreamResponse(
                headers={"Content-Type": "text/event-stream"}
            )
            await resp.prepare(request)
            sent_len: Dict[int, int] = {}
            try:
                async for out in self.tm.generate_request(gri):
                    idx = out.get("index", 0)
                    delta = out["text"][sent_len.get(idx, 0):]
                    sent_len[idx] = len(out["text"])
                    fr = out["meta_info"]["finish_reason"]
                    if delta or fr:
                        await resp.write(
                            _sse(
                                self.openai.completion_stream_chunk(
                                    body, delta, idx, fr, created, cid
                                )
                            )
                        )
                await resp.write(_sse("[DONE]"))
            except Exception as e:  # noqa: BLE001
                await resp.write(_sse({"error": str(e)}))
            return resp
        try:
            outs = []
            async for out in self.tm.generate_request(gri):
                outs.append(out)
            if not gri.is_batch() and int(body.get("n") or 1) <= 1:
                outs = outs[-1:]
            return web.json_response(
                self.openai.completion_response(body, outs, created)
            )
        except ValueError as e:
            return _json_error(str(e))

    async def v1_responses(self, request: web.Request) -> web.Response:
        """OpenAI Responses API, minimal non-streaming subset (ref
        /v1/responses, openai/serving_responses.py): `input` (string or
        message list) maps onto the chat pipeline; the reply comes back
        as a response object with one output_text message item."""
        body = await request.json()
        if body.get("stream"):
            return _json_error("streaming /v1/responses not supported yet")
        inp = body.get("input")
        if isinstance(inp, str):
            messages = [{"role": "user", "content": inp}]
        elif isinstance(inp, list):
            messages = [
                {
                    "role": m.get("role", "user"),
                    "content": (
                        m["content"]
                        if isinstance(m.get("content"), str)
                        else "".join(
                            p.get("text", "")
                            for p in (m.get("content") or [])
                            if p.get("type") in ("input_text", "output_text",
                                                 "text")
                        )
                    ),
                }
                for m in inp
            ]
        else:
            return _json_error("input must be a string or message list")
        if body.get("instructions"):
            messages = [
                {"role": "system", "content": body["instructions"]}
            ] + messages
        chat_body = {
            "model": body.get("model", self.args.served_model_name),
            "messages": messages,
            "max_tokens": body.get("max_output_tokens"),
            "temperature": body.get("temperature"),
            "top_p": body.get("top_p"),
        }
        chat_body = {k: v for k, v in chat_body.items() if v is not None}
        try:
            gri = self.openai.chat_to_gri(chat_body)
        except ValueError as e:
            return _json_error(str(e))
        outs = []
        async for out in self.tm.generate_request(gri):
            outs.append(out)
        o = outs[-1]
        meta = o["meta_info"]
        fr = (meta.get("finish_reason") or {}).get("type", "stop")
        rid = f"resp_{uuid.uuid4().hex}"
        return web.json_response({
            "id": rid,
            "object": "response",
            "created_at": int(time.time()),
            "status": "incomplete" if fr == "length" else "completed",
            "model": chat_body["model"],
            "output": [
                {
                    "type": "message",
                    "id": f"msg_{uuid.uuid4().hex}",
                    "role": "assistant",
                    "status": "completed",
                    "content": [
                        {"type": "output_text", "text": o["text"],
                         "annotations": []}
                    ],
                }
            ],
            "output_text": o["text"],
            "usage": {
                "input_tokens": meta.get("prompt_tokens", 0),
                "output_tokens": meta.get("completion_tokens", 0),
                "total_tokens": meta.get("prompt_tokens", 0)
                + meta.get("completion_tokens", 0),
            },
        })

    async def v1_chat_completions(self, request: web.Request) -> web.StreamResponse:
        try:
            body = await request.json()
            gri = self.openai.chat_to_gri(body)
        except ValueError as e:
            return _json_error(str(e))
        created = int(time.time())
        if gri.stream:
            cid = f"chatcmpl-{uuid.uuid4().hex}"
            resp = web.StreamResponse(
                headers={"Content-Type": "text/event-stream"}
            )
            await resp.prepare(request)
            sent_len: Dict[int, int] = {}
            first: Dict[int, bool] = {}
            # Streaming tool-call parse: per-choice incremental detectors
            # (ref serving_chat.py:1443 tool-call deltas).
            tool_parsers: Dict[int, object] = {}
            had_calls: Dict[int, bool] = {}

            def _get_parser(idx):
                if idx not in tool_parsers:
                    tool_parsers[idx] = self.openai.make_stream_tool_parser(
                        body
                    )
                return tool_parsers[idx]

            try:
                async for out in self.tm.generate_request(gri):
                    idx = out.get("index", 0)
                    delta = out["text"][sent_len.get(idx, 0):]
                    sent_len[idx] = len(out["text"])
                    fr = out["meta_info"]["finish_reason"]
                    is_first = first.get(idx, True)
                    parser = _get_parser(idx)
                    calls = []
                    if parser is not None and (delta or fr):
                        delta, calls = parser.parse_stream_chunk(delta)
                        if fr is not None:
                            delta += parser.finish_stream()
                    for call in calls:
                        had_calls[idx] = True
                        await resp.write(
                            _sse(
                                self.openai.chat_stream_tool_chunk(
                                    body, call, created, cid, index=idx
                                )
                            )
                        )
                    if fr is not None and had_calls.get(idx):
                        fr = dict(fr, type="tool_calls")
                    if delta or fr or is_first:
                        await resp.write(
                            _sse(
                                self.openai.chat_stream_chunk(
                                    body, delta, fr, created, cid, is_first,
                                    index=idx,
                                )
                            )
                        )
                        first[idx] = False
                await resp.write(_sse("[DONE]"))
            except Exception as e:  # noqa: BLE001
                await resp.write(_sse({"error": str(e)}))
            return resp
        try:
            outs = []
            async for o in self.tm.generate_request(gri):
                outs.append(o)
            return web.json_response(
                self.openai.chat_response(body, outs, created)
            )
        except ValueError as e:
            return _json_error(str(e))

    async def v1_messages(self, request: web.Request) -> web.StreamResponse:
        """Anthropic Messages API adapter (ref http_server.py:1982)."""
        try:
            body = await request.json()
            msgs = list(body.get("messages", []))
            if body.get("system"):
                msgs = [{"role": "system", "content": body["system"]}] + msgs
            chat_body = {
                "messages": msgs,
                "max_tokens": body.get("max_tokens", 128),
                "temperature": body.get("temperature"),
                "top_p": body.get("top_p"),
                "top_k": body.get("top_k"),
                "stop": body.get("stop_sequences"),
            }
            gri = self.openai.chat_to_gri(chat_body)
            gri.stream = bool(body.get("stream", False))
        except ValueError as e:
            return _json_error(str(e))
        model = body.get("model", self.args.served_model_name)
        mid = f"msg_{uuid.uuid4().hex}"
        if gri.stream:
            # Anthropic streaming event sequence: message_start ->
            # content_block_start -> content_block_delta* ->
            # content_block_stop -> message_delta -> message_stop.
            resp = web.StreamResponse(
                headers={"Content-Type": "text/event-stream"}
            )
            await resp.prepare(request)

            async def ev(name, payload):
                payload = {"type": name, **payload}
                await resp.write(
                    f"event: {name}\ndata: {json.dumps(payload)}\n\n".encode()
                )

            await ev("message_start", {"message": {
                "id": mid, "type": "message", "role": "assistant",
                "content": [], "model": model,
                "usage": {"input_tokens": 0, "output_tokens": 0},
            }})
            await ev("content_block_start", {
                "index": 0, "content_block": {"type": "text", "text": ""},
            })
            sent_len = 0
            meta = {}
            try:
                async for out in self.tm.generate_request(gri):
                    delta = out["text"][sent_len:]
                    sent_len = len(out["text"])
                    meta = out["meta_info"]
                    if delta:
                        await ev("content_block_delta", {
                            "index": 0,
                            "delta": {"type": "text_delta", "text": delta},
                        })
                await ev("content_block_stop", {"index": 0})
                fr = (meta.get("finish_reason") or {})
                stop_reason = {"stop": "end_turn", "length": "max_tokens"}.get(
                    fr.get("type"), "end_turn"
                )
                await ev("message_delta", {
                    "delta": {"stop_reason": stop_reason,
                              "stop_sequence": fr.get("matched_str")},
                    "usage": {
                        "output_tokens": meta.get("completion_tokens", 0)
                    },
                })
                await ev("message_stop", {})
            except Exception as e:  # noqa: BLE001
                await ev("error", {"error": {"type": "api_error",
                                             "message": str(e)}})
            return resp
        out = None
        async for o in self.tm.generate_request(gri):
            out = o
        meta = out["meta_info"]
        fr = meta["finish_reason"] or {}
        stop_reason = {
            "stop": "end_turn", "length": "max_tokens",
        }.get(fr.get("type"), "end_turn")
        return web.json_response(
            {
                "id": mid,
                "type": "message",
                "role": "assistant",
                "content": [{"type": "text", "text": out["text"]}],
                "model": model,
                "stop_reason": stop_reason,
                "usage": {
                    "input_tokens": meta.get("prompt_tokens", 0),
                    "output_tokens": meta.get("completion_tokens", 0),
                },
            }
        )

    async def ollama_chat(self, request: web.Request) -> web.Response:
        """Ollama /api/chat adapter (ref http_server.py:1953)."""
        try:
            body = await request.json()
            opts = body.get("options", {}) or {}
            chat_body = {
                "messages": body.get("messages", []),
                "max_tokens": opts.get("num_predict", 128),
                "temperature": opts.get("temperature"),
                "top_p": opts.get("top_p"),
                "top_k": opts.get("top_k"),
            }
            gri = self.openai.chat_to_gri(chat_body)
            # Ollama streams by default (NDJSON lines, not SSE).
            gri.stream = bool(body.get("stream", True))
        except ValueError as e:
            return _json_error(str(e))
        model = body.get("model", self.args.served_model_name)
        if gri.stream:
            resp = web.StreamResponse(
                headers={"Content-Type": "application/x-ndjson"}
            )
            await resp.prepare(request)
            sent_len = 0
            meta = {}
            try:
                async for out in self.tm.generate_request(gri):
                    delta = out["text"][sent_len:]
                    sent_len = len(out["text"])
                    meta = out["meta_info"]
                    if delta:
                        line = {
                            "model": model,
                            "message": {"role": "assistant", "content": delta},
                            "done": False,
                        }
                        await resp.write(
                            (json.dumps(line) + "\n").encode()
                        )
                final = {
                    "model": model,
                    "message": {"role": "assistant", "content": ""},
                    "done": True,
                    "done_reason": "stop",
                    "prompt_eval_count": meta.get("prompt_tokens", 0),
                    "eval_count": meta.get("completion_tokens", 0),
                }
                await resp.write((json.dumps(final) + "\n").encode())
            except Exception as e:  # noqa: BLE001
                await resp.write(
                    (json.dumps({"error": str(e), "done": True}) + "\n").encode()
                )
            return resp
        out = None
        async for o in self.tm.generate_request(gri):
            out = o
        return web.json_response(
            {
                "model": model,
                "message": {"role": "assistant", "content": out["text"]},
                "done": True,
                "done_reason": "stop",
                "prompt_eval_count": out["meta_info"].get("prompt_tokens", 0),
                "eval_count": out["meta_info"].get("completion_tokens", 0),
            }
        )

    # ---------------------------------------------------------------- audio
    async def _read_transcription_request(self, request: web.Request):
        """Accept multipart/form-data (OpenAI client convention) or JSON
        with a base64 `file` field. Returns (audio_bytes_or_b64, fields)."""
        ctype = request.headers.get("Content-Type", "")
        if ctype.startswith("multipart/"):
            fields = {}
            audio = None
            async for part in await request.multipart():
                if part.name == "file":
                    audio = await part.read(decode=False)
                else:
                    fields[part.name] = (await part.text())
            return audio, fields
        body = await request.json()
        return body.get("file"), body

    async def _run_audio_chat(self, audio, fields, instruction: str):
        """Drive the audio-chat model (Qwen2-Audio-class) with one audio
        clip + an instruction; returns the generated text + meta.

        Ref: srt/entrypoints/openai/serving_transcription.py — ASR models
        are served through the chat path with an adapter-built prompt."""
        prompt = fields.get("prompt") or instruction
        lang = fields.get("language")
        if lang:
            prompt = f"{prompt} Language: {lang}."
        body = {
            "messages": [{
                "role": "user",
                "content": [
                    {"type": "input_audio", "input_audio": {"data": audio}},
                    {"type": "text", "text": " " + prompt},
                ],
            }],
            "temperature": float(fields.get("temperature") or 0.0),
            "max_tokens": int(fields.get("max_tokens") or 440),
        }
        gri = self.openai.chat_to_gri(body)
        out = None
        async for out in self.tm.generate_request(gri):
            pass
        return out

    async def _audio_endpoint(self, request, instruction):
        try:
            audio, fields = await self._read_transcription_request(request)
            if audio is None:
                return _json_error("missing `file`")
            out = await self._run_audio_chat(audio, fields, instruction)
        except ValueError as e:
            return _json_error(str(e))
        text = out["text"] if out else ""
        fmt = (fields.get("response_format") or "json").lower()
        if fmt == "text":
            return web.Response(text=text, content_type="text/plain")
        resp = {"text": text}
        if fmt == "verbose_json":
            resp.update(
                task="transcribe", language=fields.get("language") or "",
                duration=None, segments=[],
                usage=out["meta_info"] if out else {},
            )
        return web.json_response(resp)

    async def v1_audio_transcriptions(self, request: web.Request):
        """OpenAI /v1/audio/transcriptions (ref http_server.py:1772):
        audio-chat models (Qwen2-Audio-class) transcribe via an
        instruction prompt."""
        return await self._audio_endpoint(
            request, "Transcribe the audio into text."
        )

    async def v1_audio_translations(self, request: web.Request):
        return await self._audio_endpoint(
            request, "Translate the audio into English text."
        )

    async def v1_realtime(self, request: web.Request):
        """Minimal OpenAI Realtime API subset over WebSocket (ref
        http_server.py:1812 /v1/realtime + entrypoints/openai/realtime):
        session.update, input_audio_buffer.append/commit/clear,
        response.create -> response.output_text.delta stream +
        response.done. Input audio: base64 pcm16 (little-endian) at
        session.input_audio_sample_rate (default 16000)."""
        import base64 as _b64

        ws = web.WebSocketResponse()
        await ws.prepare(request)
        sid = f"sess_{uuid.uuid4().hex[:12]}"
        session = {"instructions": "", "input_audio_sample_rate": 16000}
        await ws.send_json(
            {"type": "session.created",
             "session": {"id": sid, "object": "realtime.session"}}
        )
        pcm = bytearray()
        committed = []  # committed audio clips (np float32 waveforms)

        async def _respond(ev):
            import numpy as np

            from sglang_tpu.multimodal.audio import _resample_linear

            instr = (
                (ev.get("response") or {}).get("instructions")
                or session["instructions"]
                or "Transcribe the audio into text."
            )
            content = []
            for wav in committed:
                content.append(
                    {"type": "input_audio", "input_audio": {"data": wav}}
                )
            content.append({"type": "text", "text": " " + instr})
            body = {
                "messages": [{"role": "user", "content": content}],
                "temperature": 0.0,
                "max_tokens": 440,
            }
            rid = f"resp_{uuid.uuid4().hex[:12]}"
            try:
                gri = self.openai.chat_to_gri(body)
                gri.stream = True
                sent = 0
                async for out in self.tm.generate_request(gri):
                    delta = out["text"][sent:]
                    sent = len(out["text"])
                    if delta:
                        await ws.send_json(
                            {"type": "response.output_text.delta",
                             "response_id": rid, "delta": delta}
                        )
                await ws.send_json(
                    {"type": "response.output_text.done",
                     "response_id": rid}
                )
                await ws.send_json(
                    {"type": "response.done",
                     "response": {"id": rid, "status": "completed"}}
                )
            except Exception as e:  # noqa: BLE001
                await ws.send_json(
                    {"type": "error",
                     "error": {"type": "server_error", "message": str(e)}}
                )

        async for msg in ws:
            if msg.type != web.WSMsgType.TEXT:
                break
            try:
                ev = json.loads(msg.data)
            except Exception:
                await ws.send_json(
                    {"type": "error",
                     "error": {"type": "invalid_request_error",
                               "message": "invalid JSON"}}
                )
                continue
            et = ev.get("type")
            if et == "session.update":
                session.update(ev.get("session") or {})
                await ws.send_json(
                    {"type": "session.updated",
                     "session": {"id": sid, **session}}
                )
            elif et == "input_audio_buffer.append":
                pcm.extend(_b64.b64decode(ev.get("audio", "")))
            elif et == "input_audio_buffer.clear":
                pcm.clear()
                await ws.send_json({"type": "input_audio_buffer.cleared"})
            elif et == "input_audio_buffer.commit":
                import numpy as np

                from sglang_tpu.multimodal.audio import (
                    SAMPLE_RATE,
                    _resample_linear,
                )

                x = (
                    np.frombuffer(bytes(pcm), np.int16).astype(np.float32)
                    / 32768.0
                )
                sr = int(session.get("input_audio_sample_rate", 16000))
                if sr != SAMPLE_RATE:
                    x = _resample_linear(x, sr, SAMPLE_RATE)
                committed.append(x)
                pcm.clear()
                await ws.send_json(
                    {"type": "input_audio_buffer.committed",
                     "item_id": f"item_{len(committed)}"}
                )
            elif et == "response.create":
                await _respond(ev)
            else:
                await ws.send_json(
                    {"type": "error",
                     "error": {"type": "invalid_request_error",
                               "message": f"unsupported event {et!r}"}}
                )
        return ws

    # --------------------------------------------------------------- wiring
    def build_app(self) -> web.Application:
        app = web.Application(client_max_size=64 * 1024 * 1024)
        r = app.router
        r.add_get("/health", self.health)
        r.add_get("/health_generate", self.health_generate)
        r.add_get("/get_model_info", self.get_model_info)
        r.add_get("/get_server_info", self.get_server_info)
        r.add_post("/generate", self.generate)
        r.add_post("/encode", self.encode)
        r.add_post("/v1/embeddings", self.v1_embeddings)
        r.add_post("/v1/rerank", self.v1_rerank)
        r.add_post("/v1/score", self.v1_score)
        r.add_post("/v1/responses", self.v1_responses)
        r.add_post("/classify", self.classify)
        r.add_post("/parse_function_call", self.parse_function_call)
        r.add_post("/separate_reasoning", self.separate_reasoning)
        r.add_post("/init_weights_update_group",
                   self.init_weights_update_group)
        r.add_post("/update_weights_from_distributed",
                   self.update_weights_from_distributed)
        r.add_post("/pause_generation", self.pause_generation)
        r.add_post("/continue_generation", self.continue_generation)
        r.add_get("/flush_cache", self.flush_cache)
        r.add_post("/flush_cache", self.flush_cache)
        r.add_post("/abort_request", self.abort_request)
        r.add_post(
            "/{action:(start|stop|dump)}_expert_distribution_record",
            self.expert_distribution,
        )
        r.add_post("/eplb_rebalance", self.eplb_rebalance)
        r.add_post("/elastic_ep", self.elastic_ep)
        r.add_post("/start_profile", self.start_profile)
        r.add_post("/stop_profile", self.stop_profile)
        r.add_post("/open_session", self.open_session)
        r.add_post("/close_session", self.close_session)
        r.add_post("/session_tree", self.session_tree)
        r.add_post("/update_weights_from_disk", self.update_weights_from_disk)
        r.add_post("/load_lora_adapter", self.load_lora_adapter)
        r.add_post("/unload_lora_adapter", self.unload_lora_adapter)
        r.add_post("/release_memory_occupation", self.release_memory_occupation)
        r.add_post("/resume_memory_occupation", self.resume_memory_occupation)
        r.add_get("/metrics", self.metrics_endpoint)
        r.add_get("/v1/models", self.v1_models)
        r.add_post("/v1/completions", self.v1_completions)
        r.add_post("/v1/chat/completions", self.v1_chat_completions)
        r.add_post("/v1/messages", self.v1_messages)
        r.add_post("/v1/audio/transcriptions", self.v1_audio_transcriptions)
        r.add_post("/v1/audio/translations", self.v1_audio_translations)
        r.add_get("/v1/realtime", self.v1_realtime)
        r.add_post("/api/chat", self.ollama_chat)
        return app


async def _serve(server_args: ServerArgs) -> None:
    from sglang_tpu.entrypoints.engine import launch_managers
    from sglang_tpu.managers.tokenizer_manager import TokenizerManager

    import time as _time

    port_args, workers, deferred = launch_managers(server_args)
    tm = TokenizerManager(server_args, port_args)
    tm.start()
    if deferred:
        for i, t in enumerate(deferred):
            t.start()
            if i == 0:
                _time.sleep(0.05)

    await tm.wait_ready()
    if deferred is None and workers:
        from sglang_tpu.utils.watchdog import SubprocessWatchdog

        SubprocessWatchdog(workers).start()
    server = HttpServer(server_args, tm)
    app = server.build_app()
    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, server_args.host, server_args.port)
    await site.start()
    logger.info(
        "server listening on http://%s:%d", server_args.host, server_args.port
    )
    sidecar = None
    if server_args.sidecar:
        from sglang_tpu.entrypoints.sidecar import start_sidecar

        sidecar = start_sidecar(server_args)
    try:
        while True:
            await asyncio.sleep(3600)
    finally:
        if sidecar is not None:
            sidecar.stop()


def launch_server(server_args: ServerArgs) -> None:
    from sglang_tpu.utils import assert_jax_platform

    assert_jax_platform()
    configure_logger(server_args.log_level)
    from sglang_tpu.environ import envs
    from sglang_tpu.plugins import REGISTRY, load_plugins

    plugin_spec = server_args.plugins or envs.SGLANG_TPU_PLUGINS.get()
    if plugin_spec:
        load_plugins(plugin_spec)
        REGISTRY.fire_startup(server_args)
    asyncio.run(_serve(server_args))
