"""Gateway MCP tool-calling loop (ref sgl-model-gateway
routers/mcp_utils.rs): requests with type:"mcp" tools make the gateway
connect to the MCP server, expose its tools to the model, execute
tools/call rounds, and return the final answer with an mcp_calls trace.
"""

import asyncio
import json

from aiohttp import web
from aiohttp.test_utils import TestClient, TestServer


def _mock_mcp_app(state):
    """JSON-RPC 2.0 streamable-HTTP MCP server with one `add` tool."""

    async def rpc(request):
        msg = await request.json()
        method = msg.get("method")
        if method == "notifications/initialized":
            return web.Response(status=202)
        rid = msg.get("id")
        if method == "initialize":
            state["initialized"] = True
            result = {"protocolVersion": "2025-03-26",
                      "serverInfo": {"name": "mock", "version": "1"},
                      "capabilities": {"tools": {}}}
        elif method == "tools/list":
            result = {"tools": [{
                "name": "add",
                "description": "Add two integers",
                "inputSchema": {
                    "type": "object",
                    "properties": {"a": {"type": "integer"},
                                   "b": {"type": "integer"}},
                    "required": ["a", "b"],
                },
            }]}
        elif method == "tools/call":
            p = msg["params"]
            state["calls"].append(p)
            s = p["arguments"]["a"] + p["arguments"]["b"]
            result = {"content": [{"type": "text", "text": str(s)}]}
        else:
            return web.json_response(
                {"jsonrpc": "2.0", "id": rid,
                 "error": {"code": -32601, "message": "no method"}})
        return web.json_response(
            {"jsonrpc": "2.0", "id": rid, "result": result},
            headers={"Mcp-Session-Id": "sess-1"})

    app = web.Application()
    app.router.add_post("/mcp", rpc)
    return app


def _fake_model_app(state):
    """Chat worker: first turn emits a tool call to calc__add, second
    turn answers with the tool result it was fed."""

    async def chat(request):
        body = await request.json()
        state["model_turns"].append(body)
        tool_msgs = [m for m in body["messages"]
                     if m.get("role") == "tool"]
        if not tool_msgs:
            msg = {
                "role": "assistant", "content": None,
                "tool_calls": [{
                    "id": "call_1", "type": "function",
                    "function": {"name": "calc__add",
                                 "arguments": json.dumps({"a": 2, "b": 40})},
                }],
            }
            finish = "tool_calls"
        else:
            msg = {"role": "assistant",
                   "content": f"the answer is {tool_msgs[-1]['content']}"}
            finish = "stop"
        return web.json_response({
            "id": "cmpl-1", "object": "chat.completion",
            "choices": [{"index": 0, "message": msg,
                         "finish_reason": finish}],
        })

    async def health(request):
        return web.Response(text="ok")

    app = web.Application()
    app.router.add_post("/v1/chat/completions", chat)
    app.router.add_get("/health", health)
    return app


def test_mcp_client_and_tool_loop():
    from sglang_tpu.gateway.app import Router

    async def run():
        mcp_state = {"calls": [], "initialized": False}
        model_state = {"model_turns": []}
        mcp_server = TestServer(_mock_mcp_app(mcp_state))
        await mcp_server.start_server()
        worker_server = TestServer(_fake_model_app(model_state))
        await worker_server.start_server()
        worker_url = f"http://127.0.0.1:{worker_server.port}"
        mcp_url = f"http://127.0.0.1:{mcp_server.port}/mcp"

        router = Router([worker_url], "round_robin", use_native=False)
        client = TestClient(TestServer(router.build_app()))
        await client.start_server()
        try:
            resp = await client.post("/v1/chat/completions", json={
                "model": "x",
                "messages": [{"role": "user",
                              "content": "what is 2 + 40?"}],
                "tools": [{"type": "mcp", "server_label": "calc",
                           "server_url": mcp_url}],
            })
            assert resp.status == 200
            data = await resp.json()
        finally:
            await client.close()
            await mcp_server.close()
            await worker_server.close()

        assert mcp_state["initialized"]
        assert len(mcp_state["calls"]) == 1
        assert mcp_state["calls"][0]["name"] == "add"
        msg = data["choices"][0]["message"]
        assert msg["content"] == "the answer is 42"
        assert data["mcp_calls"][0]["tool"] == "add"
        assert data["mcp_calls"][0]["output"] == "42"
        # the model saw the MCP tool advertised as a function tool
        first = model_state["model_turns"][0]
        names = [t["function"]["name"] for t in first["tools"]]
        assert names == ["calc__add"]

    asyncio.new_event_loop().run_until_complete(run())


def test_mcp_sse_response_parsing():
    from sglang_tpu.gateway.mcp import McpClient

    msg = McpClient._parse_response(
        'event: message\ndata: {"jsonrpc":"2.0","id":7,'
        '"result":{"ok":true}}\n\n', 7)
    assert msg["result"]["ok"] is True


def test_mcp_loop_iteration_cap():
    """A model that never stops calling tools is cut at max_tool_calls."""
    from sglang_tpu.gateway.mcp import run_mcp_tool_loop

    async def run():
        mcp_state = {"calls": [], "initialized": False}
        mcp_server = TestServer(_mock_mcp_app(mcp_state))
        await mcp_server.start_server()
        mcp_url = f"http://127.0.0.1:{mcp_server.port}/mcp"

        async def forward(body):
            return {"choices": [{"message": {
                "role": "assistant", "content": None,
                "tool_calls": [{
                    "id": "c", "type": "function",
                    "function": {"name": "calc__add",
                                 "arguments": '{"a": 1, "b": 1}'},
                }],
            }}]}

        try:
            result = await run_mcp_tool_loop(forward, {
                "messages": [{"role": "user", "content": "go"}],
                "max_tool_calls": 3,
                "tools": [{"type": "mcp", "server_label": "calc",
                           "server_url": mcp_url}],
            })
        finally:
            await mcp_server.close()
        assert len(mcp_state["calls"]) == 3
        assert len(result["mcp_calls"]) == 3

    asyncio.new_event_loop().run_until_complete(run())
