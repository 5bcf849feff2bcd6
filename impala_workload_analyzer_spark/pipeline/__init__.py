"""Large-scale training-data pipeline operators (BASELINE.json north_star):
deduplication, similarity search, text analysis, multimodal plumbing, and
event-stream analytics over the ``documents`` / ``embeddings`` / ``events``
fixtures. Every SQL-expressible operator ships with a DuckDB oracle; the
hash primitives are md5-derived so both engines compute identical values.
"""
