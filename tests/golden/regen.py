"""Regenerate the m2b/m3 golden CSVs (tests/test_golden.py).

Run ONLY after an intentional, reviewed fit change — the whole point of
the goldens is that an unreviewed regeneration is visible in the diff.

Usage: python tests/golden/regen.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

HERE = os.path.dirname(os.path.abspath(__file__))
SF_DIR = "/root/testdata/sf0.01"


def _write(df, rows, path: str) -> None:
    with open(path, "w") as f:
        f.write(",".join(df.columns) + "\n")
        for r in rows:
            f.write(",".join(
                repr(float(v)) if isinstance(v, float) else str(v) for v in r
            ) + "\n")


def main() -> int:
    from impala_workload_analyzer_spark.ml import clustering as C
    from impala_workload_analyzer_spark.session import get_spark

    spark = get_spark("golden-regen", shuffle_partitions=8)
    curve = C.kmeans_elbow_curve(spark, SF_DIR)
    _write(curve, sorted(map(tuple, curve.collect())),
           os.path.join(HERE, "m2b_sf0.01.csv"))
    clusters = C.kmeans_clusters(spark, SF_DIR)
    _write(clusters, sorted(map(tuple, clusters.collect())),
           os.path.join(HERE, "m3_sf0.01.csv"))
    print("regenerated m2b_sf0.01.csv / m3_sf0.01.csv")
    return 0


if __name__ == "__main__":
    sys.exit(main())
