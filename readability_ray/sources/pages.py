"""Deterministic synthetic Common-Crawl-style pages table.

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Page templates follow FIXTURES.md taxonomy (basic article, semantic
article, class-name article, index/listing, short content, hidden
content, ad-laden, noise tags, formatting-rich, entities/CJK, deeply
nested, malformed fragment, doc-site, link-hierarchy, metadata-rich,
giant page).  Everything is seeded — same (seed, n_pages) → identical
bytes — so tests and benches are reproducible without external data.
When the reference checkout is present, its 128 test-pages are appended
as extra rows (urls ``https://fixtures.test/test-pages/<case>``).
"""

from __future__ import annotations

import datetime
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

_WORDS = (
    "data pipeline content extraction ray arrow batch stream shuffle "
    "partition block actor schedule spill memory network crawl parse "
    "document article heading paragraph sentence word language corpus "
    "token model training quality signal noise filter score candidate "
    "density link anchor layout template render markup style script"
).split()

_CJK = "記事本文抽出処理分散並列実行計算機資源効率速度品質信号"

_LANGS = ("en", "en", "en", "ja", "de", "fr", "es")


def _sentence(rng: random.Random, n_words: int) -> str:
    words = [rng.choice(_WORDS) for _ in range(n_words)]
    return " ".join(words).capitalize() + rng.choice([".", ".", ",", "."])


def _paragraph(rng: random.Random, n_sentences: int) -> str:
    return " ".join(_sentence(rng, rng.randint(8, 18))
                    for _ in range(n_sentences))


def _article_body(rng: random.Random, n_paras: int) -> str:
    return "\n".join(f"<p>{_paragraph(rng, rng.randint(2, 5))}</p>"
                     for _ in range(n_paras))


def _head(title: str, lang: str, extra: str = "") -> str:
    return (f'<html lang="{lang}"><head><title>{title}</title>{extra}</head>')


def _template_basic_article(rng, i, lang):
    title = f"Article {i}: {_sentence(rng, 4)}"
    return _head(title, lang) + f"""
<body>
<header><h1>Site {i % 7}</h1><nav><a href="/">Home</a><a href="/about">About</a></nav></header>
<main><article>
<h1>{title}</h1>
<p class="byline">By Author {i % 13} | 2024-0{1 + i % 9}-1{i % 9}</p>
{_article_body(rng, rng.randint(4, 10))}
</article></main>
<footer><p>&copy; 2024 Site {i % 7}</p></footer>
</body></html>"""


def _template_semantic(rng, i, lang):
    title = f"Semantic {i}"
    return _head(title, lang) + f"""
<body><main>
<h2>{_sentence(rng, 3)}</h2>
{_article_body(rng, rng.randint(3, 8))}
</main></body></html>"""


def _template_classname(rng, i, lang):
    title = f"Classic {i}"
    return _head(title, lang) + f"""
<body>
<div class="post"><h1>{title}</h1>
<div class="post-content">
{_article_body(rng, rng.randint(4, 9))}
</div></div>
<div class="sidebar"><ul><li><a href="/a">A</a></li><li><a href="/b">B</a></li></ul></div>
</body></html>"""


def _template_index(rng, i, lang):
    cards = "\n".join(
        f'<div class="product-card"><h2><a href="/product/{j}">Product {j}</a></h2>'
        f"<p>{_sentence(rng, 4)}</p></div>"
        for j in range(rng.randint(12, 30)))
    return _head(f"Listing {i}", lang) + f"""
<body><h1>Our Products</h1><div class="products">{cards}</div></body></html>"""


def _template_short(rng, i, lang):
    return _head(f"Short {i}", lang) + f"""
<body><article><h1>Short</h1><p>{_sentence(rng, 5)}</p></article></body></html>"""


def _template_hidden(rng, i, lang):
    return _head(f"Hidden {i}", lang) + f"""
<body><main><article>
<h1>Visible title {i}</h1>
{_article_body(rng, 5)}
<div style="display: none"><p>You should never see this secret text.</p></div>
<p hidden>Nor this hidden paragraph content.</p>
<div aria-hidden="true"><p>Nor the aria-hidden block.</p></div>
</article></main></body></html>"""


def _template_ads(rng, i, lang):
    return _head(f"Ads {i}", lang) + f"""
<body><main><article>
<h1>Ad-laden article {i}</h1>
<div class="ad-banner">Buy now!</div>
{_article_body(rng, 4)}
<div id="ads">More ads</div>
<div data-ad-client="ca-pub-123">Sponsored</div>
<div class="sponsor-box">Sponsor message</div>
{_article_body(rng, 3)}
</article></main></body></html>"""


def _template_noise(rng, i, lang):
    return _head(f"Noise {i}", lang, "<style>body{color:red}</style>") + f"""
<body>
<script>var x = 1 < 2 && "test";</script>
<noscript>Enable JS</noscript>
<aside>Sidebar junk</aside>
<form action="/s"><input name="q"><button>Go</button></form>
<main><article><h1>Real content {i}</h1>
{_article_body(rng, rng.randint(4, 8))}
</article></main>
<iframe src="https://ads.example.com/frame"></iframe>
</body></html>"""


def _template_formatting(rng, i, lang):
    return _head(f"Formatting {i}", lang) + f"""
<body><main><article>
<h1>Formatting {i}</h1>
<h2>Subheading</h2>
<p>Mix of <strong>bold</strong>, <em>italic</em>, and <code>inline_code()</code> text, plus a <a href="/ref/{i}">link</a>.</p>
<pre><code class="language-python">def f(x):
    return x * {i}
</code></pre>
<blockquote><p>{_sentence(rng, 10)}</p></blockquote>
<ul><li>First item</li><li>Second item<ul><li>Nested {i}</li></ul></li></ul>
<ol><li>Uno</li><li>Dos</li></ol>
<table><thead><tr><th>Name</th><th>Value</th></tr></thead>
<tbody><tr><td>alpha</td><td>{i}</td></tr><tr><td>beta</td><td>{i * 2}</td></tr></tbody></table>
<p><a href="/img/{i}"><img src="/img/{i}.png" alt="Figure {i}"></a></p>
<hr>
<p>Closing line.<br>After break.</p>
{_article_body(rng, 3)}
</article></main></body></html>"""


def _template_entities(rng, i, lang):
    cjk = "".join(rng.choice(_CJK) for _ in range(180))
    cjk = "、".join(cjk[j:j + 12] for j in range(0, len(cjk), 12))
    return _head(f"Entities &amp; Unicode {i}", "ja") + f"""
<body><main><article>
<h1>記事タイトル {i}</h1>
<p>Entities: &amp; &lt; &gt; &quot; &#039; &nbsp; &copy; &mdash; end.</p>
<p>{cjk}，{cjk[:40]}。</p>
{_article_body(rng, 3)}
</article></main></body></html>"""


def _template_nested(rng, i, lang):
    body = _article_body(rng, rng.randint(4, 7))
    inner = f"<article><h1>Deep {i}</h1>{body}</article>"
    for depth in range(4 + i % 4):
        inner = f'<div class="wrap-{depth}">{inner}</div>'
    return _head(f"Nested {i}", lang) + f"<body>{inner}</body></html>"


def _template_malformed(rng, i, lang):
    return f"""<body><div><p>Unclosed paragraph {i} {_paragraph(rng, 3)}
<p>Another one {_paragraph(rng, 3)}
<ul><li>{_sentence(rng, 5)}<li>{_sentence(rng, 6)}</div>"""


def _template_docsite(rng, i, lang):
    toc = "".join(f'<li><a href="#sec{j}">Section {j}</a></li>' for j in range(5))
    return _head(f"Docs {i}", lang) + f"""
<body>
<header><nav class="breadcrumb"><a href="/">Docs</a> / <a href="/guide">Guide</a> / Page {i}</nav></header>
<aside><nav><ul><li class="current"><a href="/guide/{i}">This page</a></li>
<li><a href="/guide/{i + 1}">Next topic</a></li></ul></nav></aside>
<main><article>
<h1>Guide page {i}</h1>
<nav class="toc"><ul>{toc}</ul></nav>
{"".join(f'<h2 id="sec{j}">Section {j}</h2>{_article_body(rng, 2)}' for j in range(5))}
<nav class="pagination"><a rel="prev" href="/guide/{i - 1}">Previous</a>
<a rel="next" href="/guide/{i + 1}">Next</a></nav>
</article></main></body></html>"""


def _template_links(rng, i, lang):
    return _head(f"Links {i}", lang,
                 f'<meta property="og:url" content="https://example.com/articles/page{i}">') + f"""
<body><main><article>
<h1>Link analysis {i}</h1>
<p>See the <a href="/articles">article index</a>, the
<a href="/articles/page{i}/details">details page</a>, a
<a href="/articles/page{i + 1}">sibling article</a>, an
<a href="https://other.example.org/x">external reference</a>, a
<a href="#frag">fragment link</a> and a <a href="?q=1">query link</a>.</p>
{_article_body(rng, 4)}
</article></main></body></html>"""


def _template_metadata(rng, i, lang):
    return _head(f"Meta {i}", lang, f"""
<meta property="og:site_name" content="MetaSite {i % 5}">
<meta name="application-name" content="MetaApp">
<meta name="author" content="Author {i % 11}">
<meta property="article:author" content="Prop Author {i % 11}">""") + f"""
<body><main><article>
<h1>Metadata-rich {i}</h1>
<p><a rel="author" href="/authors/{i % 11}">Author {i % 11}</a></p>
{_article_body(rng, 5)}
</article></main></body></html>"""


def _template_giant(rng, i, lang):
    return _head(f"Giant {i}", lang) + (
        "<body><main><article><h1>Giant page</h1>"
        + _article_body(rng, 400)
        + "</article></main></body></html>")


_TEMPLATES = [
    ("basic", _template_basic_article, 20),
    ("semantic", _template_semantic, 10),
    ("classname", _template_classname, 10),
    ("index", _template_index, 10),
    ("short", _template_short, 6),
    ("hidden", _template_hidden, 6),
    ("ads", _template_ads, 8),
    ("noise", _template_noise, 8),
    ("formatting", _template_formatting, 8),
    ("entities", _template_entities, 5),
    ("nested", _template_nested, 5),
    ("malformed", _template_malformed, 3),
    ("docsite", _template_docsite, 5),
    ("links", _template_links, 5),
    ("metadata", _template_metadata, 5),
    ("giant", _template_giant, 1),
]
_TOTAL_WEIGHT = sum(w for _, _, w in _TEMPLATES)

_EPOCH = datetime.datetime(2024, 1, 1)


def _naive_text(html: str) -> str:
    """Crawler's noisy plain-text guess (NOT the expected output)."""
    import re
    return re.sub(r"<[^>]+>", " ", html)[:4000]


def generate_pages(n_pages: int, seed: int = 42,
                   include_reference_fixtures: bool = False) -> pa.Table:
    urls, tss, htmls, texts, langs = [], [], [], [], []
    rng = random.Random(seed)
    for i in range(n_pages):
        pick = rng.randrange(_TOTAL_WEIGHT)
        acc = 0
        for name, fn, weight in _TEMPLATES:
            acc += weight
            if pick < acc:
                break
        lang = rng.choice(_LANGS)
        page_rng = random.Random(seed * 1_000_003 + i)
        html = fn(page_rng, i, lang)
        urls.append(f"https://synthetic.test/{name}/page{i}")
        tss.append(_EPOCH + datetime.timedelta(seconds=i * 37))
        htmls.append(html.encode("utf-8"))
        texts.append(_naive_text(html))
        langs.append(lang)

    if include_reference_fixtures:
        fixture_dir = "/root/reference/test/test-pages"
        if os.path.isdir(fixture_dir):
            for case in sorted(os.listdir(fixture_dir)):
                src = os.path.join(fixture_dir, case, "source.html")
                if not os.path.isfile(src):
                    continue
                with open(src, encoding="utf-8") as f:
                    html = f.read()
                urls.append(f"https://fixtures.test/test-pages/{case}")
                tss.append(_EPOCH)
                htmls.append(html.encode("utf-8"))
                texts.append(_naive_text(html))
                langs.append("en")

    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def write_pages_parquet(path: str, n_pages: int, seed: int = 42,
                        include_reference_fixtures: bool = False,
                        row_group_size: int = 512) -> str:
    table = generate_pages(n_pages, seed, include_reference_fixtures)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(table, path, row_group_size=row_group_size)
    return path


def pages_path_for_sf(sf_dir: str, cache_root: str = "/tmp/readability_ray",
                      include_reference_fixtures: bool = False) -> str:
    """Deterministic sharded pages table sized to a testdata scale factor.

    sf0.001 → 120 pages / 2 shards, sf0.01 → 1200 / 4, sf0.1 →
    12000 / 16.  Sharding matters: one monolithic parquet file gives
    the Ray read layer a single task (serial decompress); a shard per
    read task parallelizes the scan like a real multi-file crawl dump.
    Cached under /tmp keyed by the sf basename.
    """
    base = os.path.basename(os.path.normpath(sf_dir))
    n_pages, n_shards = {
        "sf0.001": (120, 2), "sf0.01": (1200, 4), "sf0.1": (12000, 16),
    }.get(base, (1200, 4))
    # scaling runs need a long-enough job to amortize pool startup:
    # GRAFT_PAGES_MULT multiplies the corpus (and shard count)
    mult = int(os.environ.get("GRAFT_PAGES_MULT", "1"))
    n_pages *= mult
    n_shards *= mult
    suffix = "+fixtures" if include_reference_fixtures else ""
    if mult > 1:
        suffix += f"-x{mult}"
    out_dir = os.path.join(cache_root, f"pages-{base}{suffix}")
    marker = os.path.join(out_dir, "_COMPLETE")
    if not os.path.isfile(marker):
        import shutil
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(out_dir, exist_ok=True)
        table = generate_pages(n_pages, seed=42,
                               include_reference_fixtures=include_reference_fixtures)
        per = (table.num_rows + n_shards - 1) // n_shards
        for i in range(n_shards):
            chunk = table.slice(i * per, per)
            if chunk.num_rows:
                pq.write_table(chunk,
                               os.path.join(out_dir, f"part-{i:03d}.parquet"),
                               row_group_size=256)
        with open(marker, "w") as f:
            f.write("ok")
    return out_dir
