"""Golden-output pins for the two rows-only (``no_oracle``) queries.

m2b_kmeans_elbow_curve / m3_kmeans_clusters publish fit-dependent ids,
so the driver's DuckDB gate checks them rows-only; their hash-matched
certificate twins (m2 / m3b) prove the fit's INVARIANTS but not its
VALUES. Both fits are deterministic (pinned seeds, canonical input
layout — see ml/clustering.py), so the values themselves are pinnable:
these tests diff each query at sf0.01 against a committed golden CSV,
catching any silent fit change that the invariant certificates would
admit (e.g. a different local optimum with the same Lloyd fixed-point
properties).

Regenerate (ONLY after an intentional, reviewed fit change):
    python tests/golden/regen.py
"""

from __future__ import annotations

import csv
import math
import os

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
GOLDEN_SF_DIR = "/root/testdata/sf0.01"


def _read_golden(name: str) -> tuple[list[str], list[tuple]]:
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        rows = list(csv.reader(f))
    return rows[0], [tuple(r) for r in rows[1:]]


def _assert_matches(df, golden_name: str) -> None:
    cols, want = _read_golden(golden_name)
    assert df.columns == cols, f"schema drift: {df.columns} != {cols}"
    got = sorted(map(tuple, df.collect()))
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    for g_row, w_row in zip(got, want):
        for c, (g, w) in zip(cols, zip(g_row, w_row)):
            if isinstance(g, float):
                wf = float(w)
                ok = (math.isnan(g) and math.isnan(wf)) or math.isclose(
                    g, wf, rel_tol=1e-9, abs_tol=1e-12
                )
            else:
                ok = str(g) == w
            assert ok, f"{golden_name} {c}: got {g!r}, golden {w!r} (row {w_row})"


def test_m2b_elbow_curve_matches_golden(spark):
    from impala_workload_analyzer_spark.ml import clustering as C

    _assert_matches(C.kmeans_elbow_curve(spark, GOLDEN_SF_DIR), "m2b_sf0.01.csv")


def test_m3_clusters_match_golden(spark):
    from impala_workload_analyzer_spark.ml import clustering as C

    _assert_matches(C.kmeans_clusters(spark, GOLDEN_SF_DIR), "m3_sf0.01.csv")
