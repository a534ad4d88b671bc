from .pages import generate_pages, pages_path_for_sf, write_pages_parquet

__all__ = ["generate_pages", "pages_path_for_sf", "write_pages_parquet"]
