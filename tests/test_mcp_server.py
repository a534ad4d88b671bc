"""MCP server (readability_ray/mcp_server.py) — counterpart of the
reference's src/mcp-server.ts:13-60: JSON-RPC 2.0 over stdio with the
extract→toMarkdown pipeline at charThreshold 100 (the MCP default).

Tested both in-process (handle_request) and as a real stdio subprocess
(the actual serving path)."""

import json
import subprocess
import sys

sys.path.insert(0, "/root/repo")

from readability_ray.mcp_server import handle_request  # noqa: E402

ARTICLE = ("<html><head><title>T</title></head><body><article><h1>Big"
           "</h1><p>" + "word " * 40 + "</p></article></body></html>")


def _call(method, params=None, req_id=1):
    return handle_request({"jsonrpc": "2.0", "id": req_id,
                           "method": method, "params": params or {}})


def test_initialize_and_tools_list():
    init = _call("initialize")
    assert init["result"]["serverInfo"]["name"] == "readability-ray-mcp"
    assert "tools" in init["result"]["capabilities"]
    tools = _call("tools/list")["result"]["tools"]
    names = {t["name"] for t in tools}
    assert names == {"read_html_as_markdown",
                     "read_file_content_as_markdown",
                     "read_url_content_as_markdown"}
    # initialized notification gets no response
    assert handle_request({"jsonrpc": "2.0",
                           "method": "notifications/initialized"}) is None


def test_read_html_as_markdown():
    resp = _call("tools/call", {"name": "read_html_as_markdown",
                                "arguments": {"html": ARTICLE}})
    result = resp["result"]
    assert "isError" not in result
    text = result["content"][0]["text"]
    assert text.startswith("# Big")
    assert "word" in text


def test_char_threshold_default_is_mcp_100():
    """The MCP entry point uses charThreshold 100 (mcp-server.ts:27),
    NOT the library's 500 — a page passing 100 but failing 500 must
    extract here."""
    body = "<p>" + "word " * 30 + "</p>"  # ~150 chars of text
    html = f"<html><body><div class='content'>{body}</div></body></html>"
    resp = _call("tools/call", {"name": "read_html_as_markdown",
                                "arguments": {"html": html}})
    text = resp["result"]["content"][0]["text"]
    assert "word" in text  # extracted at the 100 default


def test_read_file_tool_and_errors(tmp_path):
    path = tmp_path / "page.html"
    path.write_text(ARTICLE, encoding="utf-8")
    resp = _call("tools/call", {"name": "read_file_content_as_markdown",
                                "arguments": {"path": str(path)}})
    assert resp["result"]["content"][0]["text"].startswith("# Big")

    # missing file → isError tool result, not a protocol error
    resp = _call("tools/call", {"name": "read_file_content_as_markdown",
                                "arguments": {"path": "/no/such.html"}})
    assert resp["result"]["isError"] is True
    # unknown tool → same contract
    resp = _call("tools/call", {"name": "nope", "arguments": {}})
    assert resp["result"]["isError"] is True
    # reference's URL tool name resolves but errors with a pointer to
    # the no-network alternatives (parity shim, mcp-server.ts:21)
    resp = _call("tools/call", {"name": "read_url_content_as_markdown",
                                "arguments": {"url": "https://x.test/"}})
    assert resp["result"]["isError"] is True
    msg = resp["result"]["content"][0]["text"]
    assert "read_html_as_markdown" in msg
    assert "read_file_content_as_markdown" in msg
    # unknown method → JSON-RPC error
    resp = _call("definitely/not")
    assert resp["error"]["code"] == -32601


def test_resources():
    listed = _call("resources/list")["result"]["resources"]
    assert listed[0]["uri"] == "readability://info"
    read = _call("resources/read", {"uri": "readability://info"})
    assert "Available tools" in read["result"]["contents"][0]["text"]


def test_stdio_subprocess_end_to_end():
    """Full protocol exchange against the real server process."""
    proc = subprocess.Popen(
        [sys.executable, "-m", "readability_ray.mcp_server"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
        bufsize=1, cwd="/root/repo")
    try:
        def rpc(obj):
            proc.stdin.write(json.dumps(obj) + "\n")
            proc.stdin.flush()
            if "id" in obj:
                return json.loads(proc.stdout.readline())

        init = rpc({"jsonrpc": "2.0", "id": 1, "method": "initialize",
                    "params": {"protocolVersion": "2024-11-05",
                               "capabilities": {},
                               "clientInfo": {"name": "t", "version": "0"}}})
        assert init["result"]["protocolVersion"]
        rpc({"jsonrpc": "2.0", "method": "notifications/initialized"})
        out = rpc({"jsonrpc": "2.0", "id": 2, "method": "tools/call",
                   "params": {"name": "read_html_as_markdown",
                              "arguments": {"html": ARTICLE}}})
        assert out["result"]["content"][0]["text"].startswith("# Big")
    finally:
        proc.stdin.close()
        proc.wait(timeout=10)
