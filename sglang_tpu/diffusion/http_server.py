"""Diffusion HTTP server: OpenAI images API.

Ref: multimodal_gen/runtime/entrypoints/http_server.py + openai/ — the
reference serves /v1/images/generations (+ edits/variations) over its
diffusion engine. Subset here: generations with b64_json response
format, /health, /get_model_info.

    python -m sglang_tpu.diffusion.http_server --model-path X --port N
"""

from __future__ import annotations

import argparse
import asyncio
import base64
import io
import json
import logging

from aiohttp import web

from sglang_tpu.diffusion.engine import BatchingQueue, DiffGenerator
from sglang_tpu.diffusion.pipeline import GenRequest

logger = logging.getLogger(__name__)


def _png_b64(img) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def build_app(gen: DiffGenerator, model_path: str) -> web.Application:
    bq = BatchingQueue(gen)

    async def images(request: web.Request) -> web.Response:
        body = await request.json()
        prompt = body.get("prompt")
        if not prompt:
            return web.json_response(
                {"error": {"message": "prompt required"}}, status=400
            )
        size = body.get("size", "256x256")
        try:
            w, h = (int(v) for v in size.split("x"))
        except ValueError:
            return web.json_response(
                {"error": {"message": f"bad size {size!r}"}}, status=400
            )
        n = int(body.get("n", 1))
        req_proto = dict(
            prompt=prompt,
            negative_prompt=body.get("negative_prompt", ""),
            height=h, width=w,
            steps=int(body.get("steps", 20)),
            guidance_scale=float(body.get("guidance_scale", 4.5)),
        )
        loop = asyncio.get_running_loop()
        dones = [
            bq.submit(GenRequest(seed=int(body.get("seed", 0)) + i,
                                 **req_proto))
            for i in range(n)
        ]
        results = [await loop.run_in_executor(None, d.get) for d in dones]
        data = []
        for status, payload in results:
            if status != "ok":
                return web.json_response(
                    {"error": {"message": payload}}, status=500
                )
            data.append({"b64_json": _png_b64(payload)})
        return web.json_response({"created": 0, "data": data})

    async def health(_):
        return web.Response(text="ok")

    async def model_info(_):
        return web.json_response(
            {"model_path": model_path, "is_generation": True,
             "modality": "image"}
        )

    app = web.Application(client_max_size=64 << 20)
    app.router.add_post("/v1/images/generations", images)
    app.router.add_get("/health", health)
    app.router.add_get("/get_model_info", model_info)
    return app


def main(argv=None):
    import os

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # The axon sitecustomize force-resets jax_platforms at interpreter
        # start; honor an explicit CPU request (tests, CPU-only hosts).
        import jax

        jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=30010)
    ap.add_argument("--load-format", default="auto")
    ap.add_argument("--max-batch", type=int, default=8)
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    gen = DiffGenerator.from_pretrained(
        args.model_path, load_format=args.load_format,
        max_batch=args.max_batch,
    )
    web.run_app(build_app(gen, args.model_path), host=args.host,
                port=args.port)


if __name__ == "__main__":
    main()
