"""Structured Streaming lift of the extraction pipeline."""

from ocr_machine_spark.streaming.extract_stream import (
    extract_pages_stream,
    windowed_page_counts,
)

__all__ = ["extract_pages_stream", "windowed_page_counts"]
