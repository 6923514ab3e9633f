"""MCP (Model Context Protocol) tool-calling loop for the gateway.

Ref: sgl-model-gateway/src/routers/mcp_utils.rs +
core/steps/mcp_registration.rs — requests whose `tools` contain
`{"type": "mcp", "server_url": ..., "server_label": ...}` make the
gateway (not the client) drive tool execution: it connects to the MCP
server (JSON-RPC 2.0 over streamable HTTP), advertises the server's
tools to the model as plain function tools, and loops
model -> tools/call -> model until the model stops calling tools or
`max_tool_calls` / DEFAULT_MAX_ITERATIONS is hit.
"""

from __future__ import annotations

import json
import logging
from typing import Dict, List, Optional

import aiohttp

logger = logging.getLogger(__name__)

DEFAULT_MAX_ITERATIONS = 10  # ref mcp_utils.rs DEFAULT_MAX_ITERATIONS


class McpError(Exception):
    pass


class McpClient:
    """Minimal MCP client over streamable HTTP (JSON-RPC 2.0 POST).

    Handles both plain-JSON and SSE-framed (`data: {...}`) responses,
    which are the two wire shapes streamable-HTTP MCP servers produce.
    """

    PROTOCOL_VERSION = "2025-03-26"

    def __init__(self, server_url: str, authorization: Optional[str] = None,
                 session: Optional[aiohttp.ClientSession] = None):
        self.server_url = server_url
        self.authorization = authorization
        self._session = session
        self._own_session = session is None
        self._next_id = 1
        self._session_id: Optional[str] = None
        self.initialized = False

    async def _ensure_session(self) -> aiohttp.ClientSession:
        if self._session is None:
            self._session = aiohttp.ClientSession()
        return self._session

    async def close(self):
        if self._own_session and self._session is not None:
            await self._session.close()
            self._session = None

    async def _rpc(self, method: str, params: Optional[Dict] = None) -> Dict:
        sess = await self._ensure_session()
        req_id = self._next_id
        self._next_id += 1
        payload = {"jsonrpc": "2.0", "id": req_id, "method": method,
                   "params": params or {}}
        headers = {
            "Content-Type": "application/json",
            "Accept": "application/json, text/event-stream",
        }
        if self.authorization:
            headers["Authorization"] = self.authorization
        if self._session_id:
            headers["Mcp-Session-Id"] = self._session_id
        async with sess.post(self.server_url, json=payload,
                             headers=headers) as resp:
            if resp.status >= 400:
                raise McpError(f"MCP server {self.server_url}: HTTP "
                               f"{resp.status}")
            sid = resp.headers.get("Mcp-Session-Id")
            if sid:
                self._session_id = sid
            text = await resp.text()
        msg = self._parse_response(text, req_id)
        if "error" in msg:
            raise McpError(str(msg["error"].get("message", msg["error"])))
        return msg.get("result", {})

    @staticmethod
    def _parse_response(text: str, req_id: int) -> Dict:
        text = text.strip()
        if text.startswith("{"):
            return json.loads(text)
        # SSE framing: take the data: line whose id matches
        last = None
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("data:"):
                try:
                    msg = json.loads(line[5:].strip())
                except ValueError:
                    continue
                if msg.get("id") == req_id:
                    return msg
                last = msg
        if last is not None:
            return last
        raise McpError("unparseable MCP response")

    async def initialize(self) -> Dict:
        result = await self._rpc("initialize", {
            "protocolVersion": self.PROTOCOL_VERSION,
            "capabilities": {},
            "clientInfo": {"name": "sglang-tpu-gateway",
                           "version": "0.3"},
        })
        # notifications/initialized is fire-and-forget per spec
        try:
            sess = await self._ensure_session()
            headers = {"Content-Type": "application/json"}
            if self._session_id:
                headers["Mcp-Session-Id"] = self._session_id
            await sess.post(self.server_url, json={
                "jsonrpc": "2.0", "method": "notifications/initialized",
            }, headers=headers)
        except Exception:  # noqa: BLE001
            pass
        self.initialized = True
        return result

    async def list_tools(self) -> List[Dict]:
        result = await self._rpc("tools/list")
        return result.get("tools", [])

    async def call_tool(self, name: str, arguments: Dict) -> str:
        result = await self._rpc("tools/call",
                                 {"name": name, "arguments": arguments})
        parts = []
        for item in result.get("content", []):
            if item.get("type") == "text":
                parts.append(item.get("text", ""))
            else:
                parts.append(json.dumps(item))
        if result.get("isError"):
            return json.dumps({"error": "".join(parts)})
        return "".join(parts)


def extract_mcp_tools(tools: Optional[List[Dict]]) -> List[Dict]:
    return [t for t in (tools or []) if t.get("type") == "mcp"]


def _strip_mcp_prefixes(resp: Dict, tool_map: Dict[str, tuple]) -> Dict:
    """Remap internal `label__name` tool-call identifiers back to the
    real MCP tool names before the response reaches the client (which
    never registered the prefixed names)."""
    if not tool_map:
        return resp
    choices = resp.get("choices")
    if not choices:
        return resp
    out = dict(resp)
    new_choices = []
    for choice in choices:
        msg = choice.get("message") or {}
        calls = msg.get("tool_calls")
        if not calls or not any(
            c.get("function", {}).get("name") in tool_map for c in calls
        ):
            new_choices.append(choice)
            continue
        new_calls = []
        for c in calls:
            name = c.get("function", {}).get("name")
            if name in tool_map:
                c = dict(c)
                c["function"] = dict(c["function"], name=tool_map[name][1])
            new_calls.append(c)
        choice = dict(choice)
        choice["message"] = dict(msg, tool_calls=new_calls)
        new_choices.append(choice)
    out["choices"] = new_choices
    return out


async def run_mcp_tool_loop(
    forward,  # async fn(chat_body: dict) -> dict (chat.completions shape)
    body: Dict,
    session: Optional[aiohttp.ClientSession] = None,
) -> Dict:
    """Drive the gateway-side MCP tool loop for a chat/completions body
    containing `type: "mcp"` tools. Returns the final chat response with
    an `mcp_calls` trace attached (server_label, tool, arguments, output
    per call — mirroring the reference's mcp_call output items)."""
    mcp_specs = extract_mcp_tools(body.get("tools"))
    if not mcp_specs:
        return await forward(body)
    max_iters = int(body.get("max_tool_calls") or DEFAULT_MAX_ITERATIONS)
    max_iters = max(1, min(max_iters, DEFAULT_MAX_ITERATIONS))

    clients: Dict[str, McpClient] = {}
    tool_map: Dict[str, tuple] = {}  # exposed name -> (client, real name)
    fn_tools: List[Dict] = [t for t in body.get("tools", [])
                            if t.get("type") != "mcp"]
    trace: List[Dict] = []
    try:
        for spec in mcp_specs:
            label = spec.get("server_label") or "mcp"
            client = McpClient(spec["server_url"],
                               spec.get("authorization"), session=session)
            await client.initialize()
            clients[label] = client
            allowed = spec.get("allowed_tools")
            for tool in await client.list_tools():
                if allowed and tool["name"] not in allowed:
                    continue
                exposed = f"{label}__{tool['name']}"
                tool_map[exposed] = (client, tool["name"], label)
                fn_tools.append({
                    "type": "function",
                    "function": {
                        "name": exposed,
                        "description": tool.get("description", ""),
                        "parameters": tool.get("inputSchema",
                                               {"type": "object"}),
                    },
                })

        work = dict(body)
        work["tools"] = fn_tools
        work.pop("max_tool_calls", None)
        messages = list(body.get("messages", []))
        final = None
        for _ in range(max_iters):
            work["messages"] = messages
            resp = await forward(work)
            final = resp
            choice = (resp.get("choices") or [{}])[0]
            msg = choice.get("message", {})
            calls = msg.get("tool_calls") or []
            mcp_calls = [c for c in calls
                         if c.get("function", {}).get("name") in tool_map]
            # Mixed turn (MCP + client-side function calls): the client
            # must answer its calls, and chat templates expect a tool
            # message per tool_call — stop and return the whole turn
            # instead of re-forwarding a half-answered message.
            if not mcp_calls or len(mcp_calls) != len(calls):
                break
            messages.append(msg)
            for call in mcp_calls:
                fn = call["function"]
                client, real, label = tool_map[fn["name"]]
                try:
                    args = json.loads(fn.get("arguments") or "{}")
                except ValueError:
                    args = {}
                try:
                    output = await client.call_tool(real, args)
                except McpError as e:
                    output = json.dumps({"error": str(e)})
                trace.append({"server_label": label, "tool": real,
                              "arguments": args, "output": output})
                messages.append({
                    "role": "tool",
                    "tool_call_id": call.get("id", ""),
                    "content": output,
                })
        if final is not None:
            final = _strip_mcp_prefixes(final, tool_map)
            if trace:
                final = dict(final)
                final["mcp_calls"] = trace
        return final if final is not None else {"error": "mcp loop empty"}
    finally:
        for client in clients.values():
            await client.close()
