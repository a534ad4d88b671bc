"""Optional real URL fetch — the reference ``fetchLoader``'s http(s)
branch (reference cli.js:17-36: ``fetch(url)`` → ``res.text()``),
active only where the environment actually has network.

This sandbox has none, so every call here fails at connect time and
surfaces the SAME documented guidance the CLI / MCP shims have always
shown — behavior in-sandbox is unchanged (pinned by tests).  Outside
the sandbox the loader works: stdlib ``urllib`` (no new deps), charset
from the Content-Type header when present, else the WHATWG sniff
ladder (sources/charset.py) — matching ``res.text()`` semantics.
"""

from __future__ import annotations

NO_NETWORK_HINT = (
    "network fetch failed (this environment may have no network); "
    "fetch the page yourself and pass its HTML instead")

_USER_AGENT = "readability-ray/1.0"


class FetchUnavailable(RuntimeError):
    """Raised when the URL cannot be fetched — wraps both the
    no-network sandbox case and genuine remote failures, with the
    documented guidance appended."""


def fetch_url(url: str, *, timeout: float = 30.0) -> str:
    """GET ``url`` and decode the body like WHATWG ``res.text()``:
    header charset first, sniff ladder otherwise.

    Raises :class:`FetchUnavailable` on ANY transport failure —
    callers present one consistent message whether the cause is the
    sandbox (no network at all) or a dead host.
    """
    import urllib.error
    import urllib.request

    from .charset import decode_html

    if not url.startswith(("http://", "https://")):
        raise FetchUnavailable(f"not an http(s) URL: {url!r}")
    req = urllib.request.Request(url,
                                 headers={"User-Agent": _USER_AGENT})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            data = resp.read()
            ctype = resp.headers.get("Content-Type", "") or ""
    except (urllib.error.URLError, OSError, TimeoutError) as exc:
        raise FetchUnavailable(
            f"could not fetch {url}: {exc}; {NO_NETWORK_HINT}") from exc
    text, _charset = decode_html(data, content_type=ctype)
    return text
