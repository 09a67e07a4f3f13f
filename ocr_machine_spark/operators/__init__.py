"""Spark operators: Arrow-batched extraction, partitioning/skew, dedup,
similarity, and text analysis over DataFrames."""
