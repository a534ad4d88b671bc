from .extract_pipeline import extract_pipeline, run_extraction

__all__ = ["extract_pipeline", "run_extraction"]
