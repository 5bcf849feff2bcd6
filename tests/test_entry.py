"""Driver smoke contract: entry() produces rows with a stable schema."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"cluster", "max_concurrent", "avg_concurrent"}
