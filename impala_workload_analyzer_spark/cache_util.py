"""Validity stamping for the derived-data caches.

The corpus / rendered-profile / ingest / feature caches are deterministic
functions of (fixture parquet, generator source code). They are committed
to the repo for the driver-correctness scale (sf0.01) so a cold checkout
starts warm — the single biggest cold-start cost was first-touch
materialization (corpus build + 15k-profile render + ingest parse), not
query execution.

Safety: each cache root carries a FINGERPRINT file — an md5 over every
source module whose logic shapes cache content. ``is_valid`` rejects a
cache written by different source, so editing the renderer/parser/corpus
SQL auto-invalidates (the old failure mode was silently-stale caches that
only surfaced as oracle mismatches). Fixture parquet is immutable test
data, so it is not part of the fingerprint.
"""

from __future__ import annotations

import hashlib
import os

_PKG = os.path.dirname(os.path.abspath(__file__))

# every source file whose logic shapes the content of ANY derived cache;
# one shared fingerprint keeps the invalidation story simple (a corpus
# change invalidates downstream ingest/features anyway — they derive)
_SOURCES = (
    "corpus/corpus_sql.py",
    "corpus/builder.py",
    "sources/profile_render.py",
    "sources/profiles.py",
    "sources/thrift_compact.py",
    "sql_introspect/parser.py",
    "ml/clustering.py",
    "catalog.py",
)

# underscore prefix: Spark's file listing skips "_"-prefixed files, so the
# stamp can live inside a parquet/text dataset directory without being
# picked up as data
_STAMP = "_FINGERPRINT"


def fingerprint() -> str:
    h = hashlib.md5()
    for rel in _SOURCES:
        with open(os.path.join(_PKG, rel), "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def is_valid(root: str, *subdirs: str) -> bool:
    """True iff every _SUCCESS marker exists under ``root`` (or its
    ``subdirs``) and the stamp matches the current source fingerprint."""
    marks = (
        [os.path.join(root, s, "_SUCCESS") for s in subdirs]
        if subdirs
        else [os.path.join(root, "_SUCCESS")]
    )
    if not all(os.path.exists(m) for m in marks):
        return False
    stamp_path = os.path.join(root, _STAMP)
    if not os.path.exists(stamp_path):
        return False
    with open(stamp_path) as f:
        return f.read().strip() == fingerprint()


def stamp(root: str) -> None:
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, _STAMP), "w") as f:
        f.write(fingerprint())
