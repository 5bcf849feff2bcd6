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


# --- session-scoped persisted-DataFrame cache -------------------------------
#
# The shared intermediates (shingle frame, exact top-k, KMeans memos) are
# persisted once per (session, corpus). Keying by ``id(spark)`` was a trap:
# after a session is stopped and GC'd, a new session can reuse the same id
# and receive a frame bound to the dead session, and dead entries pinned
# executor memory for process lifetime. ``applicationId`` is stable for a
# session's life and never reused, so it is the correct identity; entries
# belonging to any other (replaced) session are evicted with a best-effort
# unpersist on the next miss.

_DF_CACHE: dict[tuple[str, str, str], object] = {}


def session_persisted(spark, sf_dir: str, tag: str, build):
    """Build-once-per-(session, corpus) persisted DataFrame.

    ``build`` is a zero-arg callable returning the DataFrame to persist;
    correctness never depends on the cache (a cold call rebuilds)."""
    app = spark.sparkContext.applicationId
    key = (app, os.path.normpath(sf_dir), tag)
    df = _DF_CACHE.get(key)
    if df is None:
        for stale in [k for k in _DF_CACHE if k[0] != app]:
            old = _DF_CACHE.pop(stale)
            try:
                old.unpersist()
            except Exception:  # noqa: BLE001 — dead session; nothing to free
                pass
        from pyspark import StorageLevel  # noqa: PLC0415

        df = build().persist(StorageLevel.MEMORY_AND_DISK)
        _DF_CACHE[key] = df
    return df


def evict_session_frames() -> None:
    """Unpersist and drop every session-scoped cached frame. Long
    multi-corpus drivers (the sf1 sweep runs 17 queries against two
    corpora in one session) call this between corpora so storage for the
    finished corpus never competes with the next one's execution
    memory."""
    while _DF_CACHE:
        _, df = _DF_CACHE.popitem()
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
