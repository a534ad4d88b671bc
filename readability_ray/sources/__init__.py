from .feed import make_atom_xml, make_rss_xml, parse_feed, feed_entries
from .pages import generate_pages, pages_path_for_sf, write_pages_parquet
from .sitemap import make_sitemap_xml, parse_sitemap, sitemap_entries
from .orc import read_orc, write_orc_shards
from .ipc import read_ipc, write_ipc_shards

__all__ = ["generate_pages", "pages_path_for_sf", "write_pages_parquet",
           "make_sitemap_xml", "parse_sitemap", "sitemap_entries",
           "make_rss_xml", "make_atom_xml", "parse_feed", "feed_entries",
           "read_orc", "write_orc_shards",
           "read_ipc", "write_ipc_shards"]
