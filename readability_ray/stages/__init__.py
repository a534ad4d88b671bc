from .extract_stage import ExtractStage, RESULT_SCHEMA
from .structure_stage import FullAnalysisStage, FULL_SCHEMA

__all__ = ["ExtractStage", "RESULT_SCHEMA", "FullAnalysisStage",
           "FULL_SCHEMA"]
