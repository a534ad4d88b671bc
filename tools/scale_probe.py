"""Scale probe: run the round-2 shuffle shapes on inputs 10-20x the
sf0.1 tables to evidence that wall-time scales with data, not with the
fixed spin-up that dominates at bench size.

Synthesizes enlarged tables in /tmp by replicating the driver's sf0.1
parquet with fresh ids (deterministic), then times:
  - minhash_lsh_pairs verify="estimate"   (50k docs, 10x)
  - simhash_near_pairs                    (50k docs, 10x)
  - dedup_pages_by_url                    (120k pages, 10x)
  - events_sessionize                     (2M events, 20x)
  - corpus_clean                          (50k docs, 10x)
  - ngram_jaccard_pairs (exact join)      (50k docs, 10x; ~127M
    shared-gram intermediate — the dense worst case)
  - fingerprint_overlap_pairs             (50k docs, 10x)
  - exact_dedup / token_frequency_topk    (50k docs, 10x)

Round-3 additions (run alone with --new-only):
  - token_postings          (50k docs — ADVERSARIAL: ~40-token vocab
    over 50k docs makes every token a hot key; evidences the
    documented partitioning assumption, postings ~50k ids/token)
  - source_cap              (50k docs, 20 sources x 2.5k docs)
  - decontaminate           (50k docs vs a 2.2k-doc benchmark set)
  - pricing_summary         (6M-row lineitem, map-side partials)
  - segment_top_orders      (6M lineitem ⋈ 150k orders ⋈ 15k
    customers, consistent key strides across the replicated trio)

Round-3 fourth-session additions (run alone with --s4):
  - doc_chunks / bloom_novelty        (50k docs)
  - warc sink + streaming re-read     (120k pages, one gzip member
    per record — ~1.1k shards)

Round-3 fifth-session additions (run alone with --s5):
  - substring_dedup                   (50k docs — DENSE worst case:
    replicas share every gram with their original, so ~all tokens
    are covered hits)
  - lm_quality_scores / nb_classify / dsir_weights / learn_bpe
    (50k docs; model-training exchanges at 10x corpus)
  - line_dedup over extracted markdown (120k pages; boilerplate df is
    10x sf0.1's since every copy shares its original's footer lines)

Round-4 additions (run alone with --s6): hashed-feature DSIR,
robots_filter (1000-host broadcast), url canonicalization, sitemap
explode — all at the 50k-doc probe scale.

Round-4 second-session additions (run alone with --s7): feed explode,
head-link extraction through the real parser, fetch scheduling
(1000-host delay broadcast), the composed crawl-frontier pipeline,
and the Q6/Q12/Q14 shapes over 10x-replicated lineitem (6M rows).

Round-4 third-session additions (run alone with --s8): CMS heavy
hitters + HLL distinct (constant-size sketch reduces), HTML table
explode (700k cells), weighted join sampling over 6M lines.

Round-5 fourth-session additions (run alone with --s11): TPC-H
Q15/Q17/Q21 at 6M lines, RANGE-frame window / transitions / cohorts
at 2M events, BM25 + chi-square at 50k docs, triangle count /
components / degree histogram on a 12.5k-node md5 graph.

Round-5 fifth-session additions (run alone with --s12): skyline +
session table at 2M events, flesch/gini/containment at 50k docs,
Gram at 100k vectors, covariance at 6M lines, dHash at 24k images,
FK-integrity audit over the full sf0.1 schema.

Round-5 sixth-session additions (run alone with --s13): Adamic-Adar
over the 50k-doc edge family, token entropy / dup-rate / MI at 50k
docs, dq audit at 6M lines, negative sampling / power users /
first-touch attribution at 2M events, running balance at 1.5M
orders, ORC round trip at 50k docs.

Usage: python tools/scale_probe.py [num_cpus]
       [--new-only|--s4|--s5|--s6|--s7|--s8|--s9|--s10|--s11|--s12|--s13]
Prints one JSON line; numbers land in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq


def replicate(src: str, dst: str, times: int, id_col: str | None,
              text_col: str | None = None) -> int:
    """Replicate a parquet table `times`x with disjoint ids and (for
    near-dup realism) a per-copy text perturbation so copies are
    near- but not exact duplicates."""
    table = pq.read_table(src)
    n = table.num_rows
    parts = []
    for i in range(times):
        part = table
        if id_col is not None:
            ids = part.column(id_col)
            part = part.set_column(
                part.schema.get_field_index(id_col), id_col,
                pa.compute.add(ids.cast(pa.int64()), i * n))
        if text_col is not None and i > 0:
            texts = [f"{t} copyvariant{i}"
                     for t in part.column(text_col).to_pylist()]
            part = part.set_column(
                part.schema.get_field_index(text_col), text_col,
                pa.array(texts, part.schema.field(text_col).type))
        parts.append(part)
    out = pa.concat_tables(parts)
    pq.write_table(out, dst)
    return out.num_rows


def replicate_stride(src: str, dst: str, times: int,
                     strides: dict) -> int:
    """Replicate with per-column id strides so FOREIGN KEYS stay
    consistent across the copies of a multi-table schema (copy i of
    every table shifts a shared key by i x the same stride)."""
    table = pq.read_table(src)
    parts = []
    for i in range(times):
        part = table
        for col, stride in strides.items():
            idx = part.schema.get_field_index(col)
            part = part.set_column(
                idx, col, pa.compute.add(
                    part.column(col).cast(pa.int64()), i * stride))
        parts.append(part)
    out = pa.concat_tables(parts)
    pq.write_table(out, dst)
    return out.num_rows


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    new_only = "--new-only" in sys.argv
    num_cpus = int(args[0]) if args else 32
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False)
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from readability_ray.functions import (
        corpus_clean, exact_dedup, fingerprint_overlap_pairs,
        minhash_lsh_pairs, ngram_jaccard_pairs, simhash_near_pairs,
        token_frequency_topk)
    from readability_ray.functions.textstats import events_sessionize
    from readability_ray.pipelines import dedup_pages_by_url
    from readability_ray.sources import pages_path_for_sf

    sf = "/root/testdata/sf0.1"
    tmp = tempfile.mkdtemp(prefix="scale_probe_")
    results: dict = {"num_cpus": num_cpus}

    docs10 = os.path.join(tmp, "documents10.parquet")
    n_docs = replicate(os.path.join(sf, "documents.parquet"), docs10,
                       10, "doc_id", "text")
    events20 = os.path.join(tmp, "events20.parquet")
    n_events = replicate(os.path.join(sf, "events.parquet"), events20,
                         20, None)

    def timed(name, fn):
        t0 = time.time()
        n_rows = 0
        for batch in fn().iter_batches(batch_format="pyarrow",
                                       batch_size=8192):
            n_rows += batch.num_rows
        results[name] = {"sec": round(time.time() - t0, 1),
                         "rows": n_rows}

    if "--s4" in sys.argv:
        # round-3 fourth-session ops: WARC sink+source, passage
        # chunking, line dedup over extracted markdown, Bloom novelty
        from readability_ray.functions import (bloom_novelty,
                                               chunk_documents,
                                               line_dedup)
        from readability_ray.pipelines import extract_pipeline
        from readability_ray.sources.warc import (read_warc,
                                                  write_warc_shards)

        timed("doc_chunks_50k", lambda: chunk_documents(
            ray.data.read_parquet(docs10), window=32, stride=24))

        def bloom():
            docs = ray.data.read_parquet(docs10)

            def evens(batch):
                ids = batch.column("doc_id") \
                    .to_numpy(zero_copy_only=False)
                return batch.filter(pa.array(ids % 2 == 0))

            seen = docs.map_batches(evens, batch_format="pyarrow")
            return bloom_novelty(docs, seen, m_bits=1 << 22, k=4)

        timed("bloom_novelty_50k", bloom)

        # pages 10x (120k real pages) for the WARC + line-dedup probes
        pages = pages_path_for_sf(sf)
        base = pa.concat_tables(
            [pq.read_table(os.path.join(pages, f))
             for f in sorted(os.listdir(pages)) if f.endswith(".parquet")]
        ).select(["url", "warc_ts", "html"])
        parts = []
        for i in range(10):
            urls = [f"{u}?copy={i}" if i else u
                    for u in base.column("url").to_pylist()]
            parts.append(base.set_column(
                base.schema.get_field_index("url"), "url",
                pa.array(urls, pa.string())))
        pages10 = os.path.join(tmp, "pages10.parquet")
        pq.write_table(pa.concat_tables(parts), pages10)

        warc_dir = os.path.join(tmp, "warc_shards")
        timed("warc_sink_120k", lambda: write_warc_shards(
            ray.data.read_parquet(pages10), warc_dir,
            records_per_shard=1024))
        timed("warc_read_120k", lambda: read_warc(
            warc_dir, records_per_block=256))

        md_dir = os.path.join(tmp, "markdown")
        extract_pipeline(
            ray.data.read_parquet(pages10, columns=["url", "html"]),
            use_actors=False, batch_size=64) \
            .select_columns(["url", "markdown"]).write_parquet(md_dir)
        timed("line_dedup_120k", lambda: line_dedup(
            ray.data.read_parquet(md_dir), max_doc_freq=5))

        results["n_docs"] = n_docs
        print(json.dumps(results))
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
        ray.shutdown()
        return

    if "--s5" in sys.argv:
        # round-3 fifth-session ops.  The replicated corpus is the
        # DENSE worst case for substring_dedup: every copy shares all
        # 8-gram windows with its original except the perturbed tail,
        # so nearly every token of every document is covered by a
        # duplicated gram (~2.7M gram rows through the gram-key
        # exchange, ~2.5M ids-only hits through the doc-key exchange).
        from readability_ray.functions import (
            dsir_weights, learn_bpe, lm_quality_scores,
            naive_bayes_classify, substring_dedup)

        timed("substring_dedup_50k", lambda: substring_dedup(
            ray.data.read_parquet(docs10), k=8, min_count=2))
        timed("lm_quality_50k", lambda: lm_quality_scores(
            ray.data.read_parquet(docs10), vocab_size=50_000,
            min_bigram_count=2))
        timed("nb_classify_50k", lambda: naive_bayes_classify(
            ray.data.read_parquet(docs10), vocab_size=50_000))

        def dsir():
            docs = ray.data.read_parquet(docs10)

            def evens(batch):
                ids = batch.column("doc_id") \
                    .to_numpy(zero_copy_only=False)
                return batch.filter(pa.array(ids % 2 == 0))

            target = docs.map_batches(evens, batch_format="pyarrow")
            return dsir_weights(docs, target, vocab_size=50_000,
                                min_bigram_count=2)

        timed("dsir_weights_50k", dsir)

        def bpe():
            merges = learn_bpe(ray.data.read_parquet(docs10),
                               n_merges=16)
            return ray.data.from_arrow(merges)

        timed("bpe_merges_50k", bpe)

        results["n_docs"] = n_docs
        print(json.dumps(results))
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
        ray.shutdown()
        return

    if "--s6" in sys.argv:
        # round-4 ops at the 50k-doc probe scale
        from readability_ray.functions import (canonicalize_urls,
                                               dsir_weights_hashed,
                                               robots_filter)
        from readability_ray.sources.sitemap import (make_sitemap_xml,
                                                     sitemap_entries)

        def hashed_dsir():
            docs = ray.data.read_parquet(docs10)

            def evens(batch):
                ids = batch.column("doc_id") \
                    .to_numpy(zero_copy_only=False)
                return batch.filter(pa.array(ids % 2 == 0))

            target = docs.map_batches(evens, batch_format="pyarrow")
            return dsir_weights_hashed(docs, target, n_buckets=10_000)

        timed("dsir_hashed_50k", hashed_dsir)

        def synth_urls(batch):
            ids = batch.column("doc_id").to_pylist()
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "url": pa.array(
                    [f"HTTP://H{i % 1000}.test:80/d{i % 1000}/"
                     f"{'x' if i % 2 else 'ok/page'}?utm_source=s&i={i}"
                     for i in ids], pa.string()),
            })

        def robots():
            # 1000 hosts' rule tables broadcast; 50k urls stream
            robots_ds = ray.data.from_items([
                {"host": f"h{k}.test",
                 "robots_txt": (f"User-agent: *\nDisallow: /d{k}\n"
                                f"Allow: /d{k}/ok\n")}
                for k in range(1000)])
            urls = ray.data.read_parquet(docs10) \
                .map_batches(synth_urls, batch_format="pyarrow")
            return robots_filter(urls, robots_ds)

        timed("robots_filter_50k", robots)

        timed("url_canonical_50k", lambda: canonicalize_urls(
            ray.data.read_parquet(docs10)
            .map_batches(synth_urls, batch_format="pyarrow")))

        def sitemaps():
            def synth_xml(batch):
                ids = batch.column("doc_id").to_pylist()
                return pa.table({
                    "doc_id": batch.column("doc_id"),
                    "sitemap_xml": pa.array(
                        [make_sitemap_xml(
                            [{"loc": f"https://s{i % 1000}.test/p/{i}/{j}",
                              "lastmod": f"2024-01-{(i + j) % 28 + 1:02d}"}
                             for j in range(5)])
                         for i in ids], pa.string()),
                })

            return sitemap_entries(
                ray.data.read_parquet(docs10)
                .map_batches(synth_xml, batch_format="pyarrow"))

        timed("sitemap_entries_250k", sitemaps)

        from readability_ray.functions import (anchor_text_stats,
                                               source_mixture_weights)

        def anchors():
            def synth_edges(batch):
                ids = batch.column("doc_id").to_pylist()
                srcs, hrefs, texts = [], [], []
                for i in ids:
                    for j in range(1 + i % 3):
                        srcs.append(f"https://s.test/p/{i}")
                        hrefs.append(
                            f"https://t.test/page/{(i + j) % 5000}")
                        texts.append(f"anchor-{(i + j) % 7}")
                return pa.table({
                    "src": pa.array(srcs, pa.string()),
                    "href": pa.array(hrefs, pa.string()),
                    "anchor_text": pa.array(texts, pa.string()),
                })

            return anchor_text_stats(
                ray.data.read_parquet(docs10)
                .map_batches(synth_edges, batch_format="pyarrow"))

        timed("anchor_stats_100k_edges", anchors)
        timed("source_mixture_50k", lambda: source_mixture_weights(
            ray.data.read_parquet(docs10), alpha=0.3))

        results["n_docs"] = n_docs
        print(json.dumps(results))
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
        ray.shutdown()
        return

    if "--s7" in sys.argv:
        # round-4 second-session ops at the 50k-doc / 6M-line scale
        from readability_ray.functions import (fetch_schedule,
                                               forecast_revenue,
                                               head_links,
                                               priority_line_counts,
                                               promo_revenue_share)
        from readability_ray.pipelines import frontier_pipeline
        from readability_ray.sources.feed import (feed_entries,
                                                  make_rss_xml)
        from readability_ray.sources.sitemap import make_sitemap_xml

        def feeds():
            def synth_xml(batch):
                ids = batch.column("doc_id").to_pylist()
                return pa.table({
                    "doc_id": batch.column("doc_id"),
                    "feed_xml": pa.array(
                        [make_rss_xml(f"c{i % 1000}", [
                            {"title": f"post {i}-{j}",
                             "link": f"https://f{i % 1000}.test/{i}/{j}",
                             "pubDate": f"2024-04-{(i + j) % 28 + 1:02d}",
                             "guid": f"g{i}-{j}"} for j in range(3)])
                         for i in ids], pa.string()),
                })

            return feed_entries(
                ray.data.read_parquet(docs10)
                .map_batches(synth_xml, batch_format="pyarrow"))

        timed("feed_entries_150k", feeds)

        def heads():
            def synth_html(batch):
                ids = batch.column("doc_id").to_pylist()
                htmls = []
                for i in ids:
                    htmls.append(
                        '<html><head>'
                        f'<link rel="canonical" href="https://c'
                        f'{i % 1000}.test/page/{i}">'
                        f'<link rel="next" href="/p/{i + 1}">'
                        '<link rel="alternate" hreflang="fr" '
                        f'href="https://c{i % 1000}.test/fr/{i}">'
                        '<meta name="robots" content="noindex">'
                        '</head><body><p>' + "word " * 50 +
                        '</p></body></html>')
                return pa.table({
                    "doc_id": batch.column("doc_id"),
                    "html": pa.array(htmls, pa.string()),
                })

            return head_links(
                ray.data.read_parquet(docs10)
                .map_batches(synth_html, batch_format="pyarrow"))

        timed("head_links_50k", heads)

        def synth_urls7(batch):
            ids = batch.column("doc_id").to_pylist()
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "url": pa.array(
                    [f"https://h{i % 1000}.test/p/{i % 97}/{i}"
                     for i in ids], pa.string()),
            })

        def schedule():
            robots_ds = ray.data.from_items([
                {"host": f"h{k}.test",
                 "robots_txt": f"User-agent: *\nCrawl-delay: "
                               f"{(k % 10 + 1) / 2}"}
                for k in range(1000)])
            urls = ray.data.read_parquet(docs10) \
                .map_batches(synth_urls7, batch_format="pyarrow")
            return fetch_schedule(urls, robots_ds)

        timed("fetch_schedule_50k", schedule)

        def frontier():
            def synth_xml(batch):
                ids = batch.column("doc_id").to_pylist()
                return pa.table({
                    "doc_id": batch.column("doc_id"),
                    "sitemap_xml": pa.array(
                        [make_sitemap_xml(
                            [{"loc": f"https://s{i % 1000}.test/p/"
                                     f"{i}/{j}"} for j in range(2)])
                         for i in ids], pa.string()),
                })

            docs = ray.data.read_parquet(docs10) \
                .map_batches(synth_xml, batch_format="pyarrow")
            robots_ds = ray.data.from_items([
                {"host": f"s{k}.test",
                 "robots_txt": ("User-agent: *\nDisallow: /p"
                                if k % 4 == 0 else
                                f"User-agent: *\nCrawl-delay: "
                                f"{(k % 10 + 1) / 2}")}
                for k in range(0, 1000, 2)])
            return frontier_pipeline(docs, robots_ds)

        timed("crawl_frontier_100k", frontier)

        li10 = os.path.join(tmp, "lineitem10.parquet")
        replicate(os.path.join(sf, "lineitem.parquet"), li10, 10, None)
        timed("q6_6m", lambda: forecast_revenue(
            ray.data.read_parquet(li10)))
        timed("q12_6m", lambda: priority_line_counts(
            ray.data.read_parquet(
                os.path.join(sf, "orders.parquet")),
            ray.data.read_parquet(li10)))
        timed("q14_6m", lambda: promo_revenue_share(
            ray.data.read_parquet(li10),
            ray.data.read_parquet(os.path.join(sf, "part.parquet"))))

        results["n_docs"] = n_docs
        print(json.dumps(results))
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
        ray.shutdown()
        return

    if "--s8" in sys.argv:
        # round-4 third-session ops at the 50k-doc / 6M-line scale
        from readability_ray.functions import (cms_top_token_counts,
                                               hll_distinct_tokens,
                                               weighted_order_sample)
        from readability_ray.functions.tables import page_tables

        timed("cms_heavy_hitters_50k", lambda: cms_top_token_counts(
            ray.data.read_parquet(docs10), k=50))
        timed("hll_distinct_50k", lambda: hll_distinct_tokens(
            ray.data.read_parquet(docs10)))

        def tables():
            def synth_html(batch):
                ids = batch.column("doc_id").to_pylist()
                htmls = []
                for i in ids:
                    rows = ["<tr><th>k</th><th>v</th></tr>"] + [
                        f"<tr><td>r{r}</td><td>{(i + r) % 97}</td></tr>"
                        for r in range(6)]
                    htmls.append("<table>" + "".join(rows) + "</table>")
                return pa.table({
                    "url": pa.array([f"https://t.test/{i}"
                                     for i in ids], pa.string()),
                    "html": pa.array(htmls, pa.string()),
                })

            return page_tables(
                ray.data.read_parquet(docs10)
                .map_batches(synth_html, batch_format="pyarrow"))

        timed("html_tables_50k_700k_cells", tables)

        li10 = os.path.join(tmp, "lineitem10b.parquet")
        replicate(os.path.join(sf, "lineitem.parquet"), li10, 10, None)
        timed("weighted_order_sample_6m", lambda: weighted_order_sample(
            ray.data.read_parquet(
                os.path.join(sf, "orders.parquet")),
            ray.data.read_parquet(li10), k=50))

        results["n_docs"] = n_docs
        print(json.dumps(results))
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
        ray.shutdown()
        return

    if "--s9" in sys.argv:
        # round-5 probes (VERDICT r4 items 3 + 8): distributed robots
        # parse at 100k hosts (broadcast vs colocate strategies), the
        # sampled minhash-recall metrology, and the join-bearing
        # queries at 10x to pin that the fixed hash-join spin-up
        # amortizes sublinearly.
        from readability_ray.functions import (minhash_recall_stats,
                                               priority_line_counts,
                                               robots_filter,
                                               weighted_order_sample)

        def synth_robots(batch):
            ids = batch["id"].to_pylist()
            return pa.table({
                "host": pa.array([f"h{int(i)}.test" for i in ids],
                                 pa.string()),
                "robots_txt": pa.array(
                    [(f"User-agent: *\nDisallow: /d{int(i)}\n"
                      f"Allow: /d{int(i)}/ok\nCrawl-delay: "
                      f"{(int(i) % 7) / 2}\n") for i in ids],
                    pa.string()),
            })

        def synth_urls9(batch):
            ids = batch.column("doc_id").to_pylist()
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "url": pa.array(
                    [f"https://h{i % 100_000}.test/d{i % 100_000}/"
                     f"{'x' if i % 2 else 'ok/page'}?i={i}"
                     for i in ids], pa.string()),
            })

        def robots100k(strategy):
            robots_ds = ray.data.range(100_000).map_batches(
                synth_robots, batch_format="pyarrow")
            urls = ray.data.read_parquet(docs10) \
                .map_batches(synth_urls9, batch_format="pyarrow")
            return robots_filter(urls, robots_ds, strategy=strategy)

        timed("robots_100k_hosts_broadcast",
              lambda: robots100k("broadcast"))
        timed("robots_100k_hosts_colocate",
              lambda: robots100k("colocate"))

        timed("minhash_recall_50k_sample40",
              lambda: minhash_recall_stats(
                  ray.data.read_parquet(docs10), sample_pct=40))

        li10 = os.path.join(tmp, "lineitem10c.parquet")
        n_li = replicate_stride(
            os.path.join(sf, "lineitem.parquet"), li10, 10,
            {"l_orderkey": 10_000_000})
        ord10 = os.path.join(tmp, "orders10c.parquet")
        replicate_stride(
            os.path.join(sf, "orders.parquet"), ord10, 10,
            {"o_orderkey": 10_000_000, "o_custkey": 1_000_000})
        timed("priority_line_counts_6m",
              lambda: priority_line_counts(
                  ray.data.read_parquet(ord10),
                  ray.data.read_parquet(li10)))
        timed("weighted_order_sample_6m",
              lambda: weighted_order_sample(
                  ray.data.read_parquet(ord10),
                  ray.data.read_parquet(li10), k=50))

        results["n_lineitem"] = n_li
        results["n_docs"] = n_docs
        print(json.dumps(results))
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
        ray.shutdown()
        return

    if "--s10" in sys.argv:
        # round-5 third-session ops at 10-20x: the ordered/funnel
        # event family (one user-keyed exchange each), the TeraSort
        # global rank (full-output ORDER BY), Q13/Q10 join shapes,
        # grouped HLL, and the five-sum correlation.
        from readability_ray.functions import (
            customer_order_distribution, event_interarrival_stats,
            funnel_counts, global_rank, hll_distinct_by_group,
            quantity_price_correlation, top_returned_customers,
            user_event_paths)

        timed("user_event_paths_2m", lambda: user_event_paths(
            ray.data.read_parquet(events20)))
        timed("event_interarrival_2m",
              lambda: event_interarrival_stats(
                  ray.data.read_parquet(events20)))
        timed("funnel_counts_2m", lambda: funnel_counts(
            ray.data.read_parquet(events20)))
        timed("global_rank_50k", lambda: global_rank(
            ray.data.read_parquet(docs10)))
        timed("hll_by_group_50k", lambda: hll_distinct_by_group(
            ray.data.read_parquet(docs10)))

        li10b = os.path.join(tmp, "lineitem10b.parquet")
        n_li = replicate_stride(
            os.path.join(sf, "lineitem.parquet"), li10b, 10,
            {"l_orderkey": 10_000_000})
        ord10b = os.path.join(tmp, "orders10b.parquet")
        replicate_stride(
            os.path.join(sf, "orders.parquet"), ord10b, 10,
            {"o_orderkey": 10_000_000, "o_custkey": 1_000_000})
        cust10 = os.path.join(tmp, "customer10.parquet")
        replicate_stride(
            os.path.join(sf, "customer.parquet"), cust10, 10,
            {"c_custkey": 1_000_000})
        timed("customer_order_distribution_150k",
              lambda: customer_order_distribution(
                  ray.data.read_parquet(cust10),
                  ray.data.read_parquet(ord10b)))
        timed("top_returned_customers_6m",
              lambda: top_returned_customers(
                  ray.data.read_parquet(cust10),
                  ray.data.read_parquet(ord10b),
                  ray.data.read_parquet(li10b)))
        timed("quantity_price_correlation_6m",
              lambda: quantity_price_correlation(
                  ray.data.read_parquet(li10b)))

        results["n_lineitem"] = n_li
        results["n_docs"] = n_docs
        results["n_events"] = n_events
        print(json.dumps(results))
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
        ray.shutdown()
        return

    if "--s11" in sys.argv:
        # round-5 fourth-session ops at 10-20x: the TPC-H completions
        # (Q15/Q17/Q21 at 6M lines), the RANGE-frame window /
        # transitions / cohorts at 2M events, BM25 + chi-square at
        # 50k docs, and the graph tier on a 12.5k-node/50k-edge
        # md5 family (4x the sf0.1 density).
        from readability_ray.functions import (
            bm25_topk, degree_histogram, event_type_transitions,
            events_time_range_sums, graph_components,
            lang_source_chisq, retention_cohorts,
            small_quantity_revenue, sole_return_suppliers,
            synthetic_doc_edges, top_supplier_revenue,
            triangle_count)

        timed("time_range_sums_2m", lambda: events_time_range_sums(
            ray.data.read_parquet(events20)))
        timed("event_transitions_2m",
              lambda: event_type_transitions(
                  ray.data.read_parquet(events20)))
        timed("retention_cohorts_2m", lambda: retention_cohorts(
            ray.data.read_parquet(events20)))
        timed("bm25_topk_50k", lambda: bm25_topk(
            ray.data.read_parquet(docs10)))
        timed("lang_source_chisq_50k", lambda: lang_source_chisq(
            ray.data.read_parquet(docs10)))

        def edges50k():
            return synthetic_doc_edges(
                ray.data.read_parquet(docs10)).materialize()

        e = edges50k()
        timed("triangle_count_50k_edges", lambda: triangle_count(e))
        timed("graph_components_50k_edges",
              lambda: graph_components(e))
        timed("degree_histogram_50k_edges",
              lambda: degree_histogram(e))

        li10b = os.path.join(tmp, "lineitem10b.parquet")
        n_li = replicate_stride(
            os.path.join(sf, "lineitem.parquet"), li10b, 10,
            {"l_orderkey": 10_000_000})
        sup = os.path.join(sf, "supplier.parquet")
        timed("top_supplier_revenue_6m",
              lambda: top_supplier_revenue(
                  ray.data.read_parquet(li10b),
                  ray.data.read_parquet(sup)))
        timed("small_quantity_revenue_6m",
              lambda: small_quantity_revenue(
                  ray.data.read_parquet(li10b),
                  ray.data.read_parquet(
                      os.path.join(sf, "part.parquet"))))
        timed("sole_return_suppliers_6m",
              lambda: sole_return_suppliers(
                  ray.data.read_parquet(li10b),
                  ray.data.read_parquet(sup)))

        results["n_lineitem"] = n_li
        results["n_docs"] = n_docs
        results["n_events"] = n_events
        print(json.dumps(results))
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
        ray.shutdown()
        return

    if "--s12" in sys.argv:
        # round-5 fifth-session ops at 10-20x: skyline + session
        # table at 2M events, flesch/gini/containment at 50k docs,
        # gram at 100k vectors, covariance at 6M lines, dhash at 24k
        # images, fk audit over the full sf0.1 schema (6M-row child).
        from readability_ray.functions import (
            flesch_reading_ease, gini_coefficient,
            ngram_containment_pairs, pareto_skyline, session_table)
        from readability_ray.functions.multimodal import (
            image_dhash_pairs, synth_image_family)
        from readability_ray.functions.report import table_covariance
        from readability_ray.functions.similarity import embedding_gram
        from readability_ray.functions.integrity import fk_integrity

        timed("skyline_2m", lambda: pareto_skyline(
            ray.data.read_parquet(events20),
            max_col="value", min_col="ts",
            keep_cols=["event_id", "value", "ts"]))
        timed("session_table_2m", lambda: session_table(
            ray.data.read_parquet(events20)))
        timed("flesch_50k", lambda: flesch_reading_ease(
            ray.data.read_parquet(docs10)))
        timed("gini_50k", lambda: gini_coefficient(
            ray.data.read_parquet(docs10)))
        # exact containment join needs the DF cutoff at this density
        # (replicated docs make every gram 10x hotter) — documented
        # subset semantics, the 100-TB configuration
        timed("containment_50k_df50",
              lambda: ngram_containment_pairs(
                  ray.data.read_parquet(docs10), max_doc_freq=50))
        emb20 = os.path.join(tmp, "embeddings20.parquet")
        n_emb = replicate(os.path.join(sf, "embeddings.parquet"),
                          emb20, 20, None)
        timed("gram_100k_vecs", lambda: embedding_gram(
            ray.data.read_parquet(emb20)))
        li10c = os.path.join(tmp, "lineitem10c.parquet")
        n_li = replicate_stride(
            os.path.join(sf, "lineitem.parquet"), li10c, 10,
            {"l_orderkey": 10_000_000})
        timed("covariance_6m", lambda: table_covariance(
            ray.data.read_parquet(li10c),
            numeric_cols={"l_quantity": 0, "l_extendedprice": 2,
                          "l_discount": 2, "l_tax": 2}))
        timed("dhash_pairs_24k_imgs", lambda: image_dhash_pairs(
            synth_image_family(ray.data.read_parquet(docs10),
                               max_id=20_000)))
        timed("fk_integrity_sf01", lambda: fk_integrity(sf))
        results["n_lineitem"] = n_li
        results["n_embeddings"] = n_emb
        results["n_docs"] = n_docs
        results["n_events"] = n_events
        print(json.dumps(results))
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
        ray.shutdown()
        return

    if new_only:
        from readability_ray.functions import (
            bpe_token_stats, decontaminate, events_range_join,
            pricing_summary, segment_top_orders, source_cap,
            token_postings)

        # 20x-replicated events share each original's exact ts, so a
        # 5-min band's pair count grows ~400x (every original pair has
        # 20x20 copy variants; ties never self-pair) — a deliberate
        # density stress for the banded searchsorted scan
        timed("range_join_2m", lambda: events_range_join(
            ray.data.read_parquet(events20), delta_sec=300))
        timed("bpe_tokens_50k", lambda: bpe_token_stats(
            ray.data.read_parquet(docs10)))
        timed("token_postings_50k", lambda: token_postings(
            ray.data.read_parquet(docs10)))
        timed("source_cap_50k", lambda: source_cap(
            ray.data.read_parquet(docs10), k=100))

        def decontam():
            import numpy as np
            docs = ray.data.read_parquet(docs10)

            def bench_rows(batch):
                ids = batch.column("doc_id") \
                    .to_numpy(zero_copy_only=False)
                return batch.filter(pa.array(ids % 23 == 0))

            bench = docs.map_batches(bench_rows,
                                     batch_format="pyarrow")
            return decontaminate(docs, bench, ngram_n=5)

        timed("decontaminate_50k", decontam)

        li10 = os.path.join(tmp, "lineitem10.parquet")
        n_li = replicate_stride(
            os.path.join(sf, "lineitem.parquet"), li10, 10,
            {"l_orderkey": 10_000_000})
        ord10 = os.path.join(tmp, "orders10.parquet")
        replicate_stride(
            os.path.join(sf, "orders.parquet"), ord10, 10,
            {"o_orderkey": 10_000_000, "o_custkey": 1_000_000})
        cust10 = os.path.join(tmp, "customer10.parquet")
        replicate_stride(
            os.path.join(sf, "customer.parquet"), cust10, 10,
            {"c_custkey": 1_000_000})
        timed("pricing_summary_6m", lambda: pricing_summary(
            ray.data.read_parquet(li10)))
        timed("segment_top_orders_6m", lambda: segment_top_orders(
            ray.data.read_parquet(cust10),
            ray.data.read_parquet(ord10),
            ray.data.read_parquet(li10)))
        results["n_lineitem"] = n_li
        results["n_docs"] = n_docs
        print(json.dumps(results))
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
        ray.shutdown()
        return

    if "--s13" in sys.argv:
        # round-5 sixth-session ops at 10-20x: Adamic-Adar over the
        # 50k-doc edge family, entropy/dup-rate at 50k docs, dq audit
        # at 6M lines, negatives/power-users/attribution at 2M
        # events, running balance at 1.5M orders, ORC sink+source
        # round trip at 50k docs.
        from readability_ray.functions import (
            LINEITEM_DQ_RULES, adamic_adar_pairs,
            customer_cumulative_spend, dq_check, dup_rate_by_source,
            first_touch_attribution, lang_source_mi,
            negative_event_samples, power_users,
            synthetic_doc_edges, token_entropy)
        from readability_ray.sources import (read_orc,
                                             write_orc_shards)

        def edges50k():
            return synthetic_doc_edges(
                ray.data.read_parquet(docs10)).materialize()

        e = edges50k()
        timed("adamic_adar_50k_edges", lambda: adamic_adar_pairs(e))
        timed("token_entropy_50k", lambda: token_entropy(
            ray.data.read_parquet(docs10)))
        timed("dup_rate_by_source_50k", lambda: dup_rate_by_source(
            ray.data.read_parquet(docs10)))
        timed("lang_source_mi_50k", lambda: lang_source_mi(
            ray.data.read_parquet(docs10)))
        li13 = os.path.join(tmp, "lineitem13.parquet")
        n_li = replicate_stride(
            os.path.join(sf, "lineitem.parquet"), li13, 10,
            {"l_orderkey": 10_000_000})
        timed("dq_violations_6m", lambda: dq_check(
            ray.data.read_parquet(li13), LINEITEM_DQ_RULES))
        timed("negative_samples_2m", lambda: negative_event_samples(
            ray.data.read_parquet(events20)))
        timed("power_users_2m", lambda: power_users(
            ray.data.read_parquet(events20)))
        timed("first_touch_2m", lambda: first_touch_attribution(
            ray.data.read_parquet(events20)))
        ord13 = os.path.join(tmp, "orders13.parquet")
        n_ord = replicate_stride(
            os.path.join(sf, "orders.parquet"), ord13, 10,
            {"o_orderkey": 10_000_000, "o_custkey": 1_000_000})
        timed("cumulative_spend_1m5", lambda:
              customer_cumulative_spend(
                  ray.data.read_parquet(ord13)))

        def orc_rt():
            out = os.path.join(tmp, "orc13")
            write_orc_shards(ray.data.read_parquet(docs10), out,
                             rows_per_shard=4096).materialize()
            return read_orc(out, columns=["doc_id", "lang"])

        timed("orc_roundtrip_50k", orc_rt)
        results["n_lineitem"] = n_li
        results["n_orders"] = n_ord
        results["n_docs"] = n_docs
        results["n_events"] = n_events
        print(json.dumps(results))
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
        ray.shutdown()
        return

    timed("minhash_estimate_50k", lambda: minhash_lsh_pairs(
        ray.data.read_parquet(docs10), jaccard_threshold=0.4,
        verify="estimate"))
    timed("minhash_exact_50k", lambda: minhash_lsh_pairs(
        ray.data.read_parquet(docs10), jaccard_threshold=0.4,
        verify="exact"))
    timed("simhash_50k", lambda: simhash_near_pairs(
        ray.data.read_parquet(docs10), max_hamming=8))
    timed("corpus_clean_50k", lambda: corpus_clean(
        ray.data.read_parquet(docs10), langs=("en", "de")))
    # exact set-similarity join under the dense 10x dup load: every
    # gram's doc frequency is 10x sf0.1's (max df 25 -> ~250), so the
    # quadratic intermediate is ~100x bench size (~127M shared-gram
    # rows) - the worst case the docstring warns about, on purpose.
    timed("ngram_jaccard_50k", lambda: ngram_jaccard_pairs(
        ray.data.read_parquet(docs10), jaccard_threshold=0.5))
    timed("fingerprint_overlap_50k", lambda: fingerprint_overlap_pairs(
        ray.data.read_parquet(docs10)))
    timed("exact_dedup_50k", lambda: exact_dedup(
        ray.data.read_parquet(docs10)))
    timed("token_topk_50k", lambda: token_frequency_topk(
        ray.data.read_parquet(docs10), k=50))
    timed("sessionize_2m", lambda: events_sessionize(
        ray.data.read_parquet(events20), gap_minutes=30))

    # pages 10x: replicate the generated sf0.1 pages dir
    pages = pages_path_for_sf(sf)
    tables = [pq.read_table(os.path.join(pages, f))
              for f in sorted(os.listdir(pages))
              if f.endswith(".parquet")]
    base = pa.concat_tables(tables)
    parts = []
    for i in range(10):
        urls = [f"{u}?copy={i}" if i else u
                for u in base.column("url").to_pylist()]
        parts.append(base.set_column(
            base.schema.get_field_index("url"), "url",
            pa.array(urls, pa.string())))
    pages10 = os.path.join(tmp, "pages10.parquet")
    pq.write_table(pa.concat_tables(parts), pages10)
    timed("dedup_pages_120k", lambda: dedup_pages_by_url(
        ray.data.read_parquet(pages10)))

    results["n_docs"] = n_docs
    results["n_events"] = n_events
    print(json.dumps(results))
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
