"""Link hierarchy analysis (reference src/nav/hierarchy.ts).

Classifies each link against the page's own URL into
parent/sibling/child/external by origin + path-segment common prefix.
Per-row, no shuffle (SURVEY.md §2.6).

URL semantics mirror WHATWG/Node ``new URL``: resolving a relative URL
against an opaque-path base (e.g. ``about:blank``) fails except for
fragment-only inputs — so a snapshot whose metadata.url is the parser
default ``about:blank`` classifies only absolute links.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urljoin, urlsplit

_SPECIAL_SCHEMES = {
    "http": "80", "https": "443", "ws": "80", "wss": "443",
    "ftp": "21", "file": None,
}


class URLParseError(ValueError):
    pass


@dataclass
class JsURL:
    origin: str
    pathname: str
    search: str
    href: str
    scheme: str
    opaque: bool


def js_url(href: str, base: "JsURL | None" = None) -> JsURL:
    """Minimal WHATWG-URL-compatible parse/resolve for the schemes the
    corpus uses (http/https/about)."""
    split = urlsplit(href)
    if not split.scheme:
        if base is None:
            raise URLParseError(href)
        if base.opaque:
            if href.startswith("#"):
                return JsURL(base.origin, base.pathname, base.search,
                             base.href + href, base.scheme, True)
            raise URLParseError(f"cannot resolve {href!r} against opaque base")
        resolved = urljoin(base.href, href)
        split = urlsplit(resolved)
        href = resolved
    scheme = split.scheme.lower()
    if scheme in _SPECIAL_SCHEMES and split.netloc:
        default_port = _SPECIAL_SCHEMES[scheme]
        netloc = split.netloc.lower()
        if default_port and netloc.endswith(":" + default_port):
            netloc = netloc[: -len(default_port) - 1]
        origin = f"{scheme}://{netloc}"
        pathname = split.path or "/"
        return JsURL(origin, pathname,
                     ("?" + split.query) if split.query else "",
                     href, scheme, False)
    # non-special scheme: opaque path, origin "null"
    return JsURL("null", split.path,
                 ("?" + split.query) if split.query else "",
                 href, scheme, True)


@dataclass
class LinkHierarchyAnalysis:
    parent: list = field(default_factory=list)
    sibling: list = field(default_factory=list)
    child: list = field(default_factory=list)
    external: list = field(default_factory=list)
    scores: dict = field(default_factory=dict)


def analyze_link_hierarchy(links, metadata) -> LinkHierarchyAnalysis:
    """reference src/nav/hierarchy.ts:28-221."""
    analysis = LinkHierarchyAnalysis()
    url = getattr(metadata, "url", None) if metadata is not None else None
    if not url:
        return analysis
    try:
        current = js_url(url)
    except ValueError:
        return analysis
    if links is None:
        return analysis

    current_segments = [s for s in current.pathname.split("/") if s]

    for link in links:
        # test-fixture special case carried by the reference
        # (hierarchy.ts:121-126)
        if link.href in ("valid/path", "details/more"):
            analysis.child.append(link)
            analysis.scores[link.href] = 0.5
            continue
        if not link.href:
            continue
        if link.href.startswith("#"):
            analysis.parent.append(link)
            continue
        if link.href.startswith("?"):
            continue
        try:
            link_url = js_url(link.href, current)
        except ValueError:
            continue
        if link_url.origin != current.origin:
            analysis.external.append(link)
            continue
        if (link_url.pathname == current.pathname
                and link_url.search == current.search):
            continue
        link_segments = [s for s in link_url.pathname.split("/") if s]
        if link_url.pathname == "/":
            if current.pathname != "/":
                analysis.parent.append(link)
            continue
        current_len = len(current_segments)
        link_len = len(link_segments)
        common = 0
        while (common < current_len and common < link_len
               and current_segments[common] == link_segments[common]):
            common += 1
        if common == current_len and link_len > current_len:
            analysis.child.append(link)
        elif common == link_len and current_len > link_len:
            analysis.parent.append(link)
        elif (common == current_len - 1 and common == link_len - 1
              and current_len > 0 and link_len > 0):
            if link_url.pathname != current.pathname:
                analysis.sibling.append(link)
        else:
            analysis.parent.append(link)
    return analysis
