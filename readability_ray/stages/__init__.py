from .extract_stage import ExtractStage, RESULT_SCHEMA

__all__ = ["ExtractStage", "RESULT_SCHEMA"]
