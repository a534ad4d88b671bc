"""MCP (Model Context Protocol) server — the serving-path counterpart
of the reference's ``src/mcp-server.ts:13-60``.

The protocol core is JSON-RPC 2.0 over stdio (newline-delimited), so no
SDK or network stack is needed: this module implements the handshake
(``initialize`` / ``notifications/initialized``), ``tools/list``,
``tools/call``, ``resources/list`` and ``resources/read`` directly.

Tools (the reference registers one, ``read_url_content_as_markdown``,
mcp-server.ts:21-60; the sandbox has no network, so the fetch step is
split off — the extraction path and defaults are identical):

- ``read_html_as_markdown``: html string → extract(charThreshold=100,
  the MCP default, mcp-server.ts:27) → toMarkdown.
- ``read_file_content_as_markdown``: local file path → same pipeline
  (stands in for the URL fetch; cli.py's fetch_loader has the same
  no-network split).

Run:  python -m readability_ray.mcp_server
"""

from __future__ import annotations

import json
import sys

SERVER_INFO = {"name": "readability-ray-mcp", "version": "1.0.0"}
PROTOCOL_VERSION = "2024-11-05"
DEFAULT_CHAR_THRESHOLD = 100  # reference src/mcp-server.ts:27

TOOLS = [
    {
        "name": "read_html_as_markdown",
        "description": "Extract readable content from an HTML string "
                       "and convert it to markdown",
        "inputSchema": {
            "type": "object",
            "properties": {
                "html": {"type": "string",
                         "description": "The HTML document to extract "
                                        "readable content from"},
                "url": {"type": "string",
                        "description": "Optional source URL recorded in "
                                       "the page metadata"},
                "charThreshold": {
                    "type": "number", "default": DEFAULT_CHAR_THRESHOLD,
                    "description": "Character threshold for content "
                                   "extraction"},
            },
            "required": ["html"],
        },
    },
    {
        # Parity shim: the reference's one tool name (mcp-server.ts:21)
        # is registered so clients that hard-code it get a clear
        # no-network error pointing at the working tools instead of
        # "Unknown tool".
        "name": "read_url_content_as_markdown",
        "description": "Fetch a URL, extract readable content and "
                       "convert it to markdown (reference parity name; "
                       "this sandboxed server has NO network access — "
                       "calls always fail with a pointer to "
                       "read_html_as_markdown / "
                       "read_file_content_as_markdown)",
        "inputSchema": {
            "type": "object",
            "properties": {
                "url": {"type": "string",
                        "description": "URL of the web page"},
                "charThreshold": {
                    "type": "number", "default": DEFAULT_CHAR_THRESHOLD,
                    "description": "Character threshold for content "
                                   "extraction"},
            },
            "required": ["url"],
        },
    },
    {
        "name": "read_file_content_as_markdown",
        "description": "Read a local HTML file, extract readable "
                       "content and convert it to markdown (no-network "
                       "stand-in for the reference's URL fetch)",
        "inputSchema": {
            "type": "object",
            "properties": {
                "path": {"type": "string",
                         "description": "Path of the HTML file"},
                "charThreshold": {
                    "type": "number", "default": DEFAULT_CHAR_THRESHOLD,
                    "description": "Character threshold for content "
                                   "extraction"},
            },
            "required": ["path"],
        },
    },
]

INFO_TEXT = """Readability-Ray MCP Server v1.0.0

This server provides tools to extract readable content from HTML and
convert it to markdown (Ray-Data-native reimplementation of the
readability reference; same extraction pipeline, charThreshold 100).

Available tools:
- read_html_as_markdown: Extract readable content from an HTML string
- read_file_content_as_markdown: Same, reading a local HTML file
- read_url_content_as_markdown: Reference parity name; always errors
  (no network in this environment) with a pointer to the tools above
"""


def _extract_markdown(html: str, url: str | None,
                      char_threshold: float | None) -> str:
    from .extract import extract
    from .markdown import to_markdown

    threshold = int(char_threshold if char_threshold is not None
                    else DEFAULT_CHAR_THRESHOLD)
    snapshot = extract(html, url=url, char_threshold=threshold)
    return to_markdown(snapshot.root)


def _tool_result(text: str, is_error: bool = False) -> dict:
    result = {"content": [{"type": "text", "text": text}]}
    if is_error:
        result["isError"] = True
    return result


def call_tool(name: str, arguments: dict) -> dict:
    """Dispatch one tools/call; mirrors the reference's error contract
    (mcp-server.ts:47-57: failures become isError text results, never
    protocol errors)."""
    try:
        if name == "read_html_as_markdown":
            return _tool_result(_extract_markdown(
                arguments["html"], arguments.get("url"),
                arguments.get("charThreshold")))
        if name == "read_url_content_as_markdown":
            # reference mcp-server.ts:20-60 — real fetch where network
            # exists; in this sandbox the connect fails and the error
            # result carries the documented redirection to the
            # offline tools (same isError contract either way)
            from .sources.netfetch import FetchUnavailable, fetch_url
            url = arguments["url"]
            try:
                html = fetch_url(url)
            except FetchUnavailable as exc:
                raise RuntimeError(
                    f"{exc}; pass the HTML to read_html_as_markdown, "
                    "or a saved copy to "
                    "read_file_content_as_markdown") from exc
            return _tool_result(_extract_markdown(
                html, url, arguments.get("charThreshold")))
        if name == "read_file_content_as_markdown":
            path = arguments["path"]
            try:
                with open(path, encoding="utf-8") as f:
                    html = f.read()
            except OSError as exc:
                raise RuntimeError(f"Failed to read file: {exc}") from exc
            return _tool_result(_extract_markdown(
                html, f"file://{path}", arguments.get("charThreshold")))
        raise RuntimeError(f"Unknown tool: {name}")
    except Exception as exc:  # tool errors are data, not crashes
        return _tool_result(f"Error processing input: {exc}",
                            is_error=True)


def handle_request(req: dict) -> dict | None:
    """One JSON-RPC request → response dict (None for notifications)."""
    method = req.get("method")
    req_id = req.get("id")

    def ok(result):
        return {"jsonrpc": "2.0", "id": req_id, "result": result}

    def err(code, message):
        return {"jsonrpc": "2.0", "id": req_id,
                "error": {"code": code, "message": message}}

    if method == "initialize":
        return ok({
            "protocolVersion": PROTOCOL_VERSION,
            "capabilities": {"tools": {}, "resources": {}},
            "serverInfo": SERVER_INFO,
        })
    if method in ("notifications/initialized", "initialized"):
        return None  # notification — no response
    if method == "tools/list":
        return ok({"tools": TOOLS})
    if method == "tools/call":
        params = req.get("params") or {}
        return ok(call_tool(params.get("name", ""),
                            params.get("arguments") or {}))
    if method == "resources/list":
        return ok({"resources": [{
            "uri": "readability://info",
            "name": "info", "mimeType": "text/plain",
        }]})
    if method == "resources/read":
        params = req.get("params") or {}
        if params.get("uri") == "readability://info":
            return ok({"contents": [{
                "uri": "readability://info",
                "mimeType": "text/plain",
                "text": INFO_TEXT,
            }]})
        return err(-32602, f"Unknown resource: {params.get('uri')}")
    if method == "ping":
        return ok({})
    if req_id is None:
        return None  # unknown notification — ignore
    return err(-32601, f"Method not found: {method}")


def serve(stdin=None, stdout=None) -> None:
    """Blocking stdio loop: one JSON-RPC message per line."""
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    for line in stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError:
            resp = {"jsonrpc": "2.0", "id": None,
                    "error": {"code": -32700, "message": "Parse error"}}
            stdout.write(json.dumps(resp) + "\n")
            stdout.flush()
            continue
        resp = handle_request(req)
        if resp is not None:
            stdout.write(json.dumps(resp) + "\n")
            stdout.flush()


if __name__ == "__main__":
    serve()
