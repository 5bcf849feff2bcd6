"""Driver smoke contract: entry() produces rows with a stable schema."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"cluster", "max_concurrent", "avg_concurrent"}


def test_cli_maps_reference_commands(spark, sf_dir, tmp_path):
    """The CLI runs the reference's EP3 command shapes end-to-end and
    writes one CSV table per analytic; an arbitrary log dir ingests via
    --input with the CLI-supplied tag."""
    import glob
    import os

    from impala_workload_analyzer_spark.__main__ import main
    from impala_workload_analyzer_spark.sources.profile_render import (
        ensure_profiles,
    )
    from impala_workload_analyzer_spark.sources.profiles import parsed_queries

    out = str(tmp_path / "out")
    assert main(["--sf-dir", sf_dir, "joins", "tpch", out]) == 0
    for name in ("j2_join_children", "a9_join_audit_rollup"):
        files = glob.glob(os.path.join(out, name, "part-*.csv"))
        assert files and os.path.getsize(files[0]) > 0

    log_dir = os.path.join(ensure_profiles(spark, sf_dir), "tag=adhoc")
    df = parsed_queries(spark, sf_dir, input_dir=log_dir, tag="cli_tag")
    rows = df.select("tag").distinct().collect()
    assert [r["tag"] for r in rows] == ["cli_tag"]


def test_cli_run_and_explain(sf_dir, tmp_path, capsys):
    """`run` writes any registered query's CSV; `explain` prints a plan;
    both fail fast (before booting Spark) on an unknown name."""
    import glob
    import os

    from impala_workload_analyzer_spark.__main__ import main

    out = str(tmp_path / "out")
    assert main(["--sf-dir", sf_dir, "run", "set2_party_nation_overlap", out]) == 0
    files = glob.glob(os.path.join(out, "set2_party_nation_overlap", "part-*.csv"))
    assert files and os.path.getsize(files[0]) > 0

    assert main(["--sf-dir", sf_dir, "explain", "tpch_q6"]) == 0
    cap = capsys.readouterr()
    assert "Physical Plan" in cap.out and "Scan parquet" in cap.out

    assert main(["--sf-dir", sf_dir, "run", "no_such_query", out]) == 2
    assert "unknown query" in capsys.readouterr().err
