"""Optional real-fetch path (sources/netfetch.py — reference
cli.js:17-36 URL branch).  The loopback interface exists even in the
no-network sandbox, so the REAL loader is exercised against a local
http.server; the no-route case pins the documented error shim."""

import http.server
import threading

import pytest

from readability_ray.sources.netfetch import (FetchUnavailable,
                                              fetch_url)


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):
        if self.path == "/latin1":
            body = "<p>caf\xe9</p>".encode("latin-1")
            ctype = "text/html; charset=ISO-8859-1"
        else:
            body = "<html><body><p>hello</p></body></html>".encode()
            ctype = "text/html; charset=utf-8"
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def local_server():
    srv = http.server.HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}"
    finally:
        srv.shutdown()


def test_fetch_url_real_loader(local_server):
    html = fetch_url(local_server + "/page")
    assert "<p>hello</p>" in html


def test_fetch_url_header_charset(local_server):
    html = fetch_url(local_server + "/latin1")
    assert "café" in html


def test_fetch_url_no_route_raises_documented_error():
    # TEST-NET-1 (RFC 5737) is never routable; in the sandbox ANY
    # remote host behaves like this
    with pytest.raises(FetchUnavailable) as ei:
        fetch_url("http://192.0.2.1:9/x", timeout=0.5)
    assert "fetch the page yourself" in str(ei.value)


def test_fetch_url_rejects_non_http():
    with pytest.raises(FetchUnavailable):
        fetch_url("file:///etc/passwd")


def test_cli_url_fetch(local_server, tmp_path, capsys):
    from readability_ray import cli
    out = tmp_path / "o.md"
    cli.run([local_server + "/page", "-f", "md", "-t", "1",
             "-o", str(out)])
    assert "hello" in out.read_text()


def test_mcp_url_tool_fetches(local_server):
    from readability_ray.mcp_server import call_tool
    res = call_tool("read_url_content_as_markdown",
                    {"url": local_server + "/page",
                     "charThreshold": 1})
    assert not res.get("isError")
    assert "hello" in res["content"][0]["text"]


def test_mcp_url_tool_no_network_shim():
    from readability_ray.mcp_server import call_tool
    res = call_tool("read_url_content_as_markdown",
                    {"url": "http://192.0.2.1:9/x"})
    assert res["isError"] is True
    assert "read_html_as_markdown" in res["content"][0]["text"]
