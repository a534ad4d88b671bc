"""The composed crawl-frontier pipeline: sitemap bodies → URL
frontier → canonical dedup keys → robots politeness gate → per-host
fetch schedule.

This is the frontier-tier twin of ``corpus_clean`` (the cleaning
tier's composed pipeline): every stage is an already-oracled operator
— ``sitemap_entries`` (sources/sitemap.py), ``canonicalize_urls``
(functions/urltools.py), ``robots_filter`` + ``fetch_schedule``
(functions/robots.py) — and the composition itself carries a driver
SQL oracle (`crawl_frontier`) chaining their constructible families.

Scale shape: two tiny broadcast sides (per-host rule map, per-host
delay map — both ``ray.put`` once) and exactly ONE corpus-side
exchange (the host-keyed repartition inside ``fetch_schedule``);
everything before it is stateless maps, so the frontier streams from
sitemap XML to fetch slots with no full materialization.
"""

from __future__ import annotations

import ray.data

from ..functions.robots import fetch_schedule, robots_filter
from ..functions.urltools import canonicalize_urls
from ..sources.sitemap import sitemap_entries


def frontier_pipeline(sitemap_docs: ray.data.Dataset,
                      robots: ray.data.Dataset, *,
                      agent: str = "*",
                      default_delay_s: float = 1.0,
                      xml_col: str = "sitemap_xml",
                      id_col: str = "doc_id",
                      host_col: str = "host",
                      body_col: str = "robots_txt"
                      ) -> ray.data.Dataset:
    """sitemap XML rows + per-host robots rows → politeness-scheduled
    fetch frontier.

    Drops index entries (``kind='sitemap'`` — a real crawler enqueues
    those for a second ingest round, it doesn't fetch them as pages)
    and malformed-body error rows; canonicalizes every loc (the dedup
    key downstream stages shuffle on); filters to robots-allowed URLs;
    assigns per-host fixed-point fetch slots.

    Output: (id_col, url, host, delay_ms, fetch_order,
    fetch_offset_ms) — ``url`` is the CANONICAL form.
    """
    entries = sitemap_entries(sitemap_docs, xml_col=xml_col,
                              id_col=id_col)
    urls = entries.filter(expr="kind == 'url' and error == ''") \
        .select_columns([id_col, "loc"])
    urls = canonicalize_urls(urls, url_col="loc") \
        .select_columns([id_col, "canonical_url"])
    gated = robots_filter(urls, robots, agent=agent,
                          url_col="canonical_url",
                          host_col=host_col, body_col=body_col)
    allowed = gated.filter(expr="allowed == True") \
        .select_columns([id_col, "canonical_url"])
    return fetch_schedule(allowed, robots, agent=agent,
                          url_col="canonical_url", id_col=id_col,
                          host_col=host_col, body_col=body_col,
                          default_delay_s=default_delay_s)
