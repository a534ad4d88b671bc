from .extract_pipeline import (
    dedup_pages_by_url, extract_pipeline, full_analysis_pipeline,
    run_extraction,
)
from .frontier import frontier_pipeline
from .training import training_data_pipeline

__all__ = ["dedup_pages_by_url", "extract_pipeline",
           "full_analysis_pipeline", "run_extraction",
           "training_data_pipeline", "frontier_pipeline"]
