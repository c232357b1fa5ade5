"""Training-data pipeline operators: deduplication, similarity search,
text analysis, multimodal column plumbing — the large-scale operations a
100 TB training-data pipeline needs on top of the reference's operator
set (dedup analog: scripts/cleaner/record/clean.py:41-60; everything else
is new surface, Spark-first)."""
