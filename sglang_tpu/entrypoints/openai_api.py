"""OpenAI-compatible API adapters (/v1/completions, /v1/chat/completions,
/v1/models).

Ref: srt/entrypoints/openai/{serving_base.py:73,serving_chat.py:193,903,
1443,1710, protocol.py}. Request parsing is plain-dict (schema mirrors
OpenAI); adaptation target is GenerateReqInput, same as the reference.
"""

from __future__ import annotations

import json
import time
import uuid
from typing import Any, AsyncGenerator, Dict, List, Optional

from sglang_tpu.managers.io_struct import GenerateReqInput

OPENAI_SAMPLING_FIELDS = (
    ("temperature", "temperature"),
    ("top_p", "top_p"),
    ("top_k", "top_k"),
    ("min_p", "min_p"),
    ("frequency_penalty", "frequency_penalty"),
    ("presence_penalty", "presence_penalty"),
    ("repetition_penalty", "repetition_penalty"),
    ("stop", "stop"),
    ("stop_token_ids", "stop_token_ids"),
    ("seed", "sampling_seed"),
    ("n", "n"),
    ("min_tokens", "min_new_tokens"),
    ("ignore_eos", "ignore_eos"),
    ("skip_special_tokens", "skip_special_tokens"),
)


def _sampling_from_request(body: Dict[str, Any]) -> Dict[str, Any]:
    sp: Dict[str, Any] = {}
    for src, dst in OPENAI_SAMPLING_FIELDS:
        if body.get(src) is not None:
            sp[dst] = body[src]
    max_tokens = body.get("max_completion_tokens") or body.get("max_tokens")
    sp["max_new_tokens"] = int(max_tokens) if max_tokens is not None else 128
    rf = body.get("response_format")
    if isinstance(rf, dict):
        if rf.get("type") == "json_schema":
            schema = rf.get("json_schema", {}).get("schema")
            if schema is not None:
                sp["json_schema"] = json.dumps(schema)
        elif rf.get("type") == "json_object":
            sp["json_schema"] = json.dumps({"type": "object"})
    if body.get("regex") is not None:
        sp["regex"] = body["regex"]
    if body.get("ebnf") is not None:
        sp["ebnf"] = body["ebnf"]
    return sp


def _usage(meta: Dict[str, Any]) -> Dict[str, Any]:
    return {
        "prompt_tokens": meta.get("prompt_tokens", 0),
        "completion_tokens": meta.get("completion_tokens", 0),
        "total_tokens": meta.get("prompt_tokens", 0)
        + meta.get("completion_tokens", 0),
        "prompt_tokens_details": {"cached_tokens": meta.get("cached_tokens", 0)},
    }


def _finish_reason_str(fr: Optional[dict]) -> Optional[str]:
    if fr is None:
        return None
    return {
        "stop": "stop",
        "length": "length",
        "abort": "abort",
        "tool_calls": "tool_calls",
    }.get(fr.get("type"), "stop")


class OpenAIServing:
    def __init__(self, tokenizer_manager, served_model: str,
                 tool_call_parser: Optional[str] = None,
                 reasoning_parser: Optional[str] = None):
        self.tm = tokenizer_manager
        self.served_model = served_model
        self.tool_call_parser = tool_call_parser
        self.reasoning_parser = reasoning_parser
        self._img_placeholder: Optional[str] = None

    def _image_placeholder(self) -> str:
        """Per-model image placeholder TEXT (Qwen2-VL: <|image_pad|>,
        LLaVA: <image>), resolved by decoding cfg.image_token_id so the
        tokenizer maps it back to the id TokenizerManager._process_images
        expands. Hardcoding "<image>" breaks models whose placeholder
        differs (it tokenizes as plain text -> 0 image tokens found)."""
        if self._img_placeholder is None:
            ph = "<image>"
            try:
                cfg, _ = self.tm._get_mm()
                tid = getattr(cfg, "image_token_id",
                              getattr(cfg, "image_token_index", None))
                if tid is not None and self.tm.tokenizer is not None:
                    dec = self.tm.tokenizer.decode([int(tid)])
                    if dec:
                        ph = dec
            except Exception:
                pass
            self._img_placeholder = ph
        return self._img_placeholder

    def _audio_placeholder(self) -> str:
        """Per-model audio placeholder TEXT (Qwen2-Audio: <|AUDIO|>),
        resolved by decoding cfg.audio_token_index."""
        if getattr(self, "_aud_placeholder", None) is None:
            ph = "<|AUDIO|>"
            try:
                cfg, _ = self.tm._get_mm()
                tid = getattr(cfg, "audio_token_id",
                              getattr(cfg, "audio_token_index", None))
                if tid is not None and self.tm.tokenizer is not None:
                    dec = self.tm.tokenizer.decode([int(tid)])
                    if dec:
                        ph = dec
            except Exception:
                pass
            self._aud_placeholder = ph
        return self._aud_placeholder

    # ------------------------------------------------------------ completions
    def completions_to_gri(self, body: Dict[str, Any]) -> GenerateReqInput:
        prompt = body.get("prompt")
        if prompt is None:
            raise ValueError("prompt is required")
        sp = _sampling_from_request(body)
        kwargs: Dict[str, Any] = dict(
            sampling_params=sp,
            stream=bool(body.get("stream", False)),
            return_logprob=body.get("logprobs") is not None,
            top_logprobs_num=int(body.get("logprobs") or 0),
        )
        # prompt may be str | [str] | [int] | [[int]]
        if isinstance(prompt, str):
            kwargs["text"] = prompt
        elif prompt and isinstance(prompt[0], int):
            kwargs["input_ids"] = prompt
        elif prompt and isinstance(prompt[0], str):
            kwargs["text"] = prompt
        else:
            kwargs["input_ids"] = prompt
        return GenerateReqInput(**kwargs)

    def completion_response(
        self, body: Dict, outs: List[Dict], created: int
    ) -> Dict:
        choices = []
        for i, out in enumerate(outs):
            meta = out["meta_info"]
            ch = {
                "index": i,
                "text": out["text"],
                "finish_reason": _finish_reason_str(meta["finish_reason"]),
                "logprobs": None,
            }
            if meta.get("output_token_logprobs") is not None:
                ch["logprobs"] = {
                    "token_logprobs": [
                        x[0] for x in meta["output_token_logprobs"]
                    ],
                    "tokens": [str(x[1]) for x in meta["output_token_logprobs"]],
                    "top_logprobs": None,
                }
            choices.append(ch)
        total = {
            "prompt_tokens": sum(o["meta_info"].get("prompt_tokens", 0) for o in outs),
            "completion_tokens": sum(
                o["meta_info"].get("completion_tokens", 0) for o in outs
            ),
        }
        total["total_tokens"] = total["prompt_tokens"] + total["completion_tokens"]
        return {
            "id": f"cmpl-{uuid.uuid4().hex}",
            "object": "text_completion",
            "created": created,
            "model": body.get("model", self.served_model),
            "choices": choices,
            "usage": total,
        }

    def completion_stream_chunk(
        self, body: Dict, delta_text: str, index: int, fr: Optional[dict],
        created: int, cid: str,
    ) -> Dict:
        return {
            "id": cid,
            "object": "text_completion",
            "created": created,
            "model": body.get("model", self.served_model),
            "choices": [
                {
                    "index": index,
                    "text": delta_text,
                    "finish_reason": _finish_reason_str(fr),
                    "logprobs": None,
                }
            ],
        }

    # ------------------------------------------------------------------ chat
    def chat_to_gri(self, body: Dict[str, Any]) -> GenerateReqInput:
        messages = body.get("messages")
        if not messages:
            raise ValueError("messages is required")
        tokenizer = self.tm.tokenizer
        if tokenizer is None:
            raise ValueError("chat API requires a tokenizer")
        # Multimodal content parts: pull image_url payloads out and flatten
        # the message content to text (the chat template's image token
        # stands in for each image; TokenizerManager expands it).
        # Ref: serving_chat.py multimodal content handling.
        image_data = []
        audio_data = []
        norm_messages = []
        for m in messages:
            content = m.get("content")
            if isinstance(content, list):
                texts = []
                for part in content:
                    ptype = part.get("type")
                    if ptype == "image_url":
                        url = part["image_url"]
                        if isinstance(url, dict):
                            url = url["url"]
                        image_data.append(url)
                        texts.append(self._image_placeholder())
                    elif ptype == "input_audio":
                        # OpenAI audio part: {input_audio: {data: b64,
                        # format: "wav"}}; also accept audio_url like the
                        # reference's serving_chat.
                        ia = part.get("input_audio") or {}
                        data = ia.get("data")
                        if data is None and part.get("audio_url"):
                            data = part["audio_url"]
                            if isinstance(data, dict):
                                data = data["url"]
                        audio_data.append(data)
                        texts.append(self._audio_placeholder())
                    elif ptype == "audio_url":
                        url = part["audio_url"]
                        if isinstance(url, dict):
                            url = url["url"]
                        audio_data.append(url)
                        texts.append(self._audio_placeholder())
                    elif ptype == "text":
                        texts.append(part.get("text", ""))
                m = dict(m, content="".join(texts))
            norm_messages.append(m)
        messages = norm_messages
        tools = body.get("tools")
        try:
            kwargs = {}
            if tools:
                kwargs["tools"] = tools
            prompt_ids = tokenizer.apply_chat_template(
                messages, tokenize=True, add_generation_prompt=True, **kwargs
            )
        except Exception:
            # Fallback template (no chat_template in tokenizer config)
            text = ""
            for m in messages:
                text += f"<|{m['role']}|>\n{m['content']}\n"
            text += "<|assistant|>\n"
            prompt_ids = tokenizer.encode(text)
        sp = _sampling_from_request(body)
        top_lp = 0
        if body.get("logprobs"):
            top_lp = int(body.get("top_logprobs") or 0)
        return GenerateReqInput(
            input_ids=list(prompt_ids),
            sampling_params=sp,
            stream=bool(body.get("stream", False)),
            return_logprob=bool(body.get("logprobs")),
            top_logprobs_num=top_lp,
            image_data=image_data or None,
            audio_data=audio_data or None,
        )

    def chat_response(self, body: Dict, outs, created: int) -> Dict:
        """Build a chat.completion; `outs` is one output dict per choice
        (n>1 parallel sampling yields several)."""
        if isinstance(outs, dict):
            outs = [outs]
        choices = [
            self._chat_choice(body, out, i) for i, out in enumerate(outs)
        ]
        usage = {
            "prompt_tokens": outs[0]["meta_info"].get("prompt_tokens", 0),
            "completion_tokens": sum(
                o["meta_info"].get("completion_tokens", 0) for o in outs
            ),
            "prompt_tokens_details": {
                "cached_tokens": outs[0]["meta_info"].get("cached_tokens", 0)
            },
        }
        usage["total_tokens"] = (
            usage["prompt_tokens"] + usage["completion_tokens"]
        )
        return {
            "id": f"chatcmpl-{uuid.uuid4().hex}",
            "object": "chat.completion",
            "created": created,
            "model": body.get("model", self.served_model),
            "choices": choices,
            "usage": usage,
        }

    def _chat_choice(self, body: Dict, out: Dict, index: int) -> Dict:
        meta = out["meta_info"]
        text = out["text"]
        message: Dict[str, Any] = {"role": "assistant", "content": text}
        finish = _finish_reason_str(meta["finish_reason"])

        if self.reasoning_parser and body.get("separate_reasoning", True):
            from sglang_tpu.parser.reasoning_parser import ReasoningParser

            r = ReasoningParser(self.reasoning_parser).parse_non_stream(text)
            if r.reasoning_text:
                message["reasoning_content"] = r.reasoning_text
                message["content"] = text = r.normal_text or ""

        tools = body.get("tools")
        if tools and self.tool_call_parser:
            from sglang_tpu.function_call.parser import FunctionCallParser

            parser = FunctionCallParser(tools, self.tool_call_parser)
            if parser.has_tool_call(text):
                normal, calls = parser.parse_non_stream(text)
                if calls:
                    message["content"] = normal or None
                    message["tool_calls"] = [
                        {
                            "id": f"call_{uuid.uuid4().hex[:24]}",
                            "type": "function",
                            "index": c.tool_index,
                            "function": {
                                "name": c.name,
                                "arguments": c.parameters,
                            },
                        }
                        for c in calls
                    ]
                    finish = "tool_calls"
        return {
            "index": index,
            "message": message,
            "finish_reason": finish,
            "logprobs": None,
        }

    def chat_stream_chunk(
        self, body: Dict, delta: Optional[str], fr: Optional[dict],
        created: int, cid: str, first: bool = False, index: int = 0,
    ) -> Dict:
        d: Dict[str, Any] = {}
        if first:
            d["role"] = "assistant"
            d["content"] = delta or ""
        elif delta is not None:
            d["content"] = delta
        return {
            "id": cid,
            "object": "chat.completion.chunk",
            "created": created,
            "model": body.get("model", self.served_model),
            "choices": [
                {
                    "index": index,
                    "delta": d,
                    "finish_reason": _finish_reason_str(fr),
                }
            ],
        }

    def chat_stream_tool_chunk(
        self, body: Dict, call, created: int, cid: str, index: int = 0,
    ) -> Dict:
        """Streaming tool-call delta (ref serving_chat.py:1443)."""
        return {
            "id": cid,
            "object": "chat.completion.chunk",
            "created": created,
            "model": body.get("model", self.served_model),
            "choices": [
                {
                    "index": index,
                    "delta": {
                        "tool_calls": [
                            {
                                "index": call.tool_index,
                                "id": f"call_{uuid.uuid4().hex[:24]}",
                                "type": "function",
                                "function": {
                                    "name": call.name,
                                    "arguments": call.parameters,
                                },
                            }
                        ]
                    },
                    "finish_reason": None,
                }
            ],
        }

    def make_stream_tool_parser(self, body: Dict):
        """Per-request streaming tool-call parser, or None."""
        tools = body.get("tools")
        if not tools or not self.tool_call_parser:
            return None
        from sglang_tpu.function_call.parser import FunctionCallParser

        return FunctionCallParser(tools, self.tool_call_parser)

    def models_response(self) -> Dict:
        return {
            "object": "list",
            "data": [
                {
                    "id": self.served_model,
                    "object": "model",
                    "created": int(time.time()),
                    "owned_by": "sglang-tpu",
                }
            ],
        }
