from .extract_pipeline import (
    dedup_pages_by_url, extract_pipeline, full_analysis_pipeline,
    run_extraction,
)
from .frontier import frontier_pipeline
from .streaming import sessionize_incremental
from .training import training_data_pipeline

__all__ = ["dedup_pages_by_url", "extract_pipeline",
           "full_analysis_pipeline", "run_extraction",
           "training_data_pipeline", "frontier_pipeline",
           "sessionize_incremental"]
