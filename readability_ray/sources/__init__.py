from .pages import generate_pages, pages_path_for_sf, write_pages_parquet
from .sitemap import make_sitemap_xml, parse_sitemap, sitemap_entries

__all__ = ["generate_pages", "pages_path_for_sf", "write_pages_parquet",
           "make_sitemap_xml", "parse_sitemap", "sitemap_entries"]
