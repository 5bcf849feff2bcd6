"""PySpark-native analytics engine with the query and data-processing
capabilities of ``jjyao/impala-workload-analyzer``.

The reference (/root/reference) is an Impala *workload analyzer*: it ingests
runtime profiles into a relational corpus (queries / operators / fragments)
and runs analytical queries over it (operator time breakdowns, join audits,
pre-aggregation effectiveness, concurrency, clustering). This package
re-expresses every one of those capabilities Spark-first:

- ``corpus``      — the workload-corpus data model (SURVEY.md §1) and a
                    deterministic synthetic generator with a DuckDB twin.
- ``operators``   — the analytical query repertoire (SURVEY.md §2.2-2.7).
- ``functions``   — scalar function library (SURVEY.md §2.8).
- ``sources``     — profile ingest: decode + stateful plan-tree parse
                    (SURVEY.md §2.1).
- ``sql_introspect`` — SQL-text-as-data: feature extraction +
                    parameterization (SURVEY.md §2.9).
- ``ml``          — workload KMeans clustering (SURVEY.md §2.10).
- ``pipeline``    — large-scale training-data ops (dedup, similarity,
                    text analysis, multimodal) beyond the reference.
- ``streaming``   — Structured Streaming analogs of the batch windows.
"""

__version__ = "0.1.0"
