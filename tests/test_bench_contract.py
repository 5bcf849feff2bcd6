"""bench.py contract guards — no Spark session needed.

The bench harness resolves package internals lazily (the shared-build
functions, io._build_cache for the stream-setup timing): a rename would
otherwise surface only mid-bench at round close-out. These tests fail
at pytest time instead.
"""

from __future__ import annotations

import importlib


def test_one_time_builds_resolve():
    bench = importlib.import_module("bench")
    builds = bench._one_time_builds()
    assert len(builds) == 11
    for name, fn in builds:
        assert callable(fn), name


def test_stream_setup_dependency_resolves():
    from impala_workload_analyzer_spark.io import _build_cache  # noqa: F401


def test_headliners_are_registered_queries():
    bench = importlib.import_module("bench")
    import __spark_entry__ as entrymod

    qs = set(entrymod.queries())
    missing = [n for n in bench.HEADLINERS if n not in qs]
    assert not missing, f"headliners without queries: {missing}"
