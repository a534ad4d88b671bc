"""Byte-identity oracle: run the REFERENCE's own pipeline (type-stripped
to ESM, executed by node) against this engine on identical VDOM input,
and assert byte-equality of every output surface.

How it works (tools/oracle/):
- strip_ts.py erases TS type syntax from the reference's pure modules
  (dom/constants/preprocess/extract/format/markdown/aria chain) into
  /tmp .mjs at session start — the reference itself is the oracle, not
  hand-ported golden strings.
- This side parses each page with OUR parser, serializes the raw VDOM
  to JSON, and hands it to the reference's real ``extract()`` via its
  own ``options.parser`` extension point (reference src/types.ts:48).
- Both sides then run their full pipeline (preprocess → score →
  classify → ARIA → format) from the same tree; outputs must match
  byte-for-byte: extracted text, markdown, HTML, title/lang/siteName,
  node count, links, candidate scores, ARIA tree rendering.

What this does NOT cover: the HTML→VDOM parse itself (htmlparser2 is an
npm dependency absent from the sandbox); parser semantics are pinned by
the ported parser suites in test_parser.py / test_quirks.py.

Corpus: all reference test-pages fixtures (the full Mozilla-inherited
128-dir corpus) + a deterministic synthetic-template sweep.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.oracle.vdom_json import document_to_json  # noqa: E402

ORACLE_DIR = "/tmp/readability_oracle_mjs"
DRIVER = os.path.join(os.path.dirname(__file__), "..", "tools", "oracle",
                      "driver.mjs")
TEST_PAGES_DIR = "/root/reference/test/test-pages"

FIXTURE_CASES = sorted(
    case for case in (os.listdir(TEST_PAGES_DIR)
                      if os.path.isdir(TEST_PAGES_DIR) else [])
    if os.path.isfile(os.path.join(TEST_PAGES_DIR, case, "source.html")))


class OracleSession:
    """One node process for the whole pytest session; NDJSON req/resp."""

    def __init__(self):
        from tools.oracle.strip_ts import generate
        generate(ORACLE_DIR)
        self.proc = subprocess.Popen(
            ["node", DRIVER, ORACLE_DIR],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True, bufsize=1)
        self._id = 0

    def run(self, doc_json: dict, options: dict | None = None) -> dict:
        self._id += 1
        req = {"id": self._id, "doc": doc_json, "options": options or {}}
        self.proc.stdin.write(json.dumps(req) + "\n")
        self.proc.stdin.flush()
        line = self.proc.stdout.readline()
        if not line:
            err = self.proc.stderr.read()
            raise RuntimeError(f"oracle driver died: {err[:2000]}")
        resp = json.loads(line)
        assert resp["id"] == self._id
        return resp

    def close(self):
        try:
            self.proc.stdin.close()
            self.proc.wait(timeout=10)
        except Exception:
            self.proc.kill()


@pytest.fixture(scope="session")
def oracle():
    sess = OracleSession()
    yield sess
    sess.close()


def _both_sides(oracle: OracleSession, html: str, url: str | None = None,
                char_threshold: int | None = None) -> tuple[dict, dict]:
    """Run reference (node) and this engine on the same parsed VDOM."""
    from readability_ray.extract import extract
    from readability_ray.format import format_document, stringify, to_html
    from readability_ray.markdown import to_markdown
    from readability_ray.parser import parse_html
    from readability_ray.readable_aria import aria_tree_to_string
    from readability_ray.vdom import ensure_recursion_headroom

    ensure_recursion_headroom()
    doc = parse_html(html)
    if url is not None:
        doc.document_uri = url
    doc_json = document_to_json(doc)

    options = {}
    if char_threshold is not None:
        options["charThreshold"] = char_threshold
    ref = oracle.run(doc_json, options)
    assert ref["error"] is None, f"oracle failed: {ref['error']}"

    snap = extract(html, parser=lambda _h: doc,
                   char_threshold=char_threshold, url=url)
    ours = {
        "title": snap.metadata.title,
        "lang": snap.metadata.lang,
        "site_name": snap.metadata.site_name,
        "node_count": snap.node_count,
        "text": (format_document(stringify(snap.root))
                 if snap.root else ""),
        "markdown": to_markdown(snap.root) if snap.root else "",
        "html": to_html(snap.root) if snap.root else "",
        "aria": (aria_tree_to_string(snap.aria_tree)
                 if snap.aria_tree else ""),
        "links": [[link.href, link.text] for link in snap.links],
        "candidate_scores": [float(score)
                             for _el, score in snap.main_candidates],
        "root_tag": snap.root.tag if snap.root else None,
    }
    return ref, ours


FIELDS = ("title", "lang", "site_name", "root_tag", "node_count", "text",
          "markdown", "html", "aria", "links", "candidate_scores")


def _assert_match(ref: dict, ours: dict, label: str):
    for field in FIELDS:
        expected = ref[field]
        actual = ours[field]
        if field == "candidate_scores":
            # JS numbers arrive via JSON; compare as floats exactly
            expected = [float(x) for x in expected]
        assert actual == expected, (
            f"{label}: field {field!r} diverges\n"
            f"  reference: {expected!r}\n"
            f"  ours:      {actual!r}")


@pytest.mark.parametrize("case", FIXTURE_CASES)
def test_fixture_byte_identity(oracle, case):
    with open(os.path.join(TEST_PAGES_DIR, case, "source.html"),
              encoding="utf-8") as f:
        html = f.read()
    ref, ours = _both_sides(
        oracle, html, url=f"https://fixtures.test/test-pages/{case}")
    _assert_match(ref, ours, f"fixture {case}")


def test_synthetic_templates_byte_identity(oracle):
    """Every synthetic template family × several seeds, one assert per
    page — covers the corpus the Ray pipeline is benchmarked on."""
    from readability_ray.sources.pages import generate_pages
    table = generate_pages(120, seed=20260817)
    urls = table.column("url").to_pylist()
    htmls = table.column("html").to_pylist()
    for url, html in zip(urls, htmls):
        html = bytes(html).decode("utf-8")
        ref, ours = _both_sides(oracle, html, url=url)
        _assert_match(ref, ours, url)


def test_char_threshold_quirk_parity(oracle):
    """charThreshold<100 skips the isProbablyContent root gate
    (reference extract.ts:827) — exercise both sides of the branch."""
    html = ("<html><body><div class='content'><p>short text, only a "
            "few words here.</p></div></body></html>")
    for threshold in (50, 500):
        ref, ours = _both_sides(oracle, html, char_threshold=threshold)
        _assert_match(ref, ours, f"threshold={threshold}")
