"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract / frame-sample as Arrow-batched ``mapInPandas``.

No image/audio libraries exist in this container, so the DECODERS are
deterministic fakes (clearly marked below) — but everything Spark-side is
real and tested: the binary column type, the metadata struct, the UDF batch
shape (N input rows -> M output rows for frame sampling), partitioning, and
the oracle checks. Swapping ``_fake_decode_*`` for PIL/ffmpeg bodies changes
no plumbing. ``decode_image_real`` shows the gated import pattern and raises
``NotImplementedError`` in this environment.

The media table is derived from ``documents``: payload = the utf-8 text
bytes standing in for an encoded image; metadata (width/height/n_frames)
derived deterministically so DuckDB can re-derive expected outputs.

Scale: all three ops are stateless projections over the binary column —
no shuffle; Arrow moves the bytes to Python in batches, which is exactly
how a real decode pipeline feeds GPU/CPU feature extractors at 100 TB.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mm0 — the media table: opaque binary payload + typed metadata."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (16 + F.col("n_chars") % 64).alias("width"),
            (16 + (F.col("n_chars") * 7) % 48).alias("height"),
            (1 + F.col("n_chars") % 30).alias("n_frames"),
            F.lit("fake/raw").alias("codec"),
        ).alias("meta"),
    )


def _fake_decode_features(payload: bytes) -> tuple[int, float]:
    """DETERMINISTIC FAKE image decode: (n_bytes, mean_luma) where luma is
    derived from md5 so DuckDB can recompute it. A real decoder would
    return pixel statistics here."""
    digest = hashlib.md5(payload).hexdigest()
    return len(payload), float(int(digest[:4], 16) % 256)


def image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mm1 — decode + feature-extract: one output row per media row."""
    media = media_table(spark, sf_dir)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                n_bytes, luma = _fake_decode_features(bytes(payload))
                rows.append((mid, meta["width"], meta["height"], n_bytes, luma))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "mean_luma"]
            )

    return media.mapInPandas(
        run,
        schema="media_id bigint, width bigint, height bigint, n_bytes bigint, "
               "mean_luma double",
    )


def frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mm2 — frame sampling: N input rows -> M output rows (every 5th frame
    of each payload's n_frames), the UDTF-shaped batch contract."""
    media = media_table(spark, sf_dir)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                digest = hashlib.md5(bytes(payload)).hexdigest()
                for frame_idx in range(0, int(meta["n_frames"]), 5):
                    # fake per-frame fingerprint a real pipeline would
                    # replace with a decoded-frame embedding
                    fp = int(hashlib.md5(f"{digest}:{frame_idx}".encode()).hexdigest()[:8], 16)
                    rows.append((mid, frame_idx, fp))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_fp"])

    return media.mapInPandas(
        run, schema="media_id bigint, frame_idx bigint, frame_fp bigint"
    )


def audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mm3 — audio decode + loudness stats: the audio leg of the media
    pipeline. sample_rate / n_samples come from typed metadata; the FAKE
    decode derives rms loudness from the payload's md5 (a real decoder
    would return waveform statistics). duration is computed engine-side
    in DOUBLE so both engines divide identically."""
    docs = load_table(spark, sf_dir, "documents")
    audio = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        (8000 + (F.col("n_chars") % 3) * 4000).alias("sample_rate"),
        (1000 + (F.col("n_chars") * 13) % 5000).alias("n_samples"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, sr, ns in zip(
                pdf["media_id"], pdf["payload"], pdf["sample_rate"], pdf["n_samples"]
            ):
                digest = hashlib.md5(bytes(payload)).hexdigest()
                # fake rms a real pipeline would compute from the waveform
                rms = (int(digest[4:8], 16) % 1000) / 10.0
                rows.append((mid, int(sr), int(ns), float(ns) / float(sr) * 1000.0, rms))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_samples", "duration_ms", "rms"],
            )

    return audio.mapInPandas(
        run,
        schema="media_id bigint, sample_rate bigint, n_samples bigint, "
               "duration_ms double, rms double",
    )


def decode_image_real(payload: bytes):  # pragma: no cover - env has no codecs
    """The real-decoder slot: gated import, explicit failure here."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError as exc:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "plug PIL/torchvision in here — no Spark-side changes needed"
        ) from exc
    return Image.open(payload)  # pragma: no cover


_MM_PACK_BUDGET = 512   # token budget per assembled multimodal sample bin
_MM_PACK_SHARDS = 32    # packing is shard-local, same trade as tx9
_MM_PATCH = 16          # ViT-style patch edge: image tokens = ceil(w/p)*ceil(h/p)


def multimodal_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mm4 — multimodal SAMPLE ASSEMBLY: join each document's text-token
    count with its image's patch-token count (ViT accounting:
    ceil(w/patch) x ceil(h/patch)), then greedy-pack the combined budgets
    into fixed-size training bins exactly like tx9 — the packer a VLM
    pre-training pipeline runs, where an image consumes sequence
    positions just like text. Output is one row per (shard, bin) with the
    modality split of its fill.

    Scale: the doc⋈media join is keyed by the shared id (broadcast at
    fixture scale, a co-partitioned shuffle join at 100 TB); packing is
    SHARD-LOCAL (hash shards, within-shard window, grouped agg) — no
    global sort at any size, same flat plan as tx9."""
    from .text import _SPARK_H, _SPARK_NORM  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.expr(_SPARK_NORM), " ")).cast("bigint").alias("text_tokens"),
    )
    media = media_table(spark, sf_dir).select(
        "media_id",
        (
            F.ceil(F.col("meta.width") / float(_MM_PATCH))
            * F.ceil(F.col("meta.height") / float(_MM_PATCH))
        ).cast("bigint").alias("image_tokens"),
    )
    samples = (
        docs.join(media, docs.doc_id == media.media_id)
        .select(
            "doc_id", "text_tokens", "image_tokens",
            F.least(
                F.col("text_tokens") + F.col("image_tokens"),
                F.lit(_MM_PACK_BUDGET),
            ).alias("n_tokens"),  # oversize samples truncate to one full bin
            (
                F.expr(_SPARK_H.format(x="CAST(doc_id AS STRING)"))
                % _MM_PACK_SHARDS
            ).alias("shard"),
        )
    )
    w = Window.partitionBy("shard").orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    packed = samples.withColumn("cum", F.sum("n_tokens").over(w)).withColumn(
        "bin", ((F.col("cum") - 1) / F.lit(_MM_PACK_BUDGET)).cast("bigint")
    )
    return packed.groupBy("shard", "bin").agg(
        F.count("*").alias("n_samples"),
        F.sum("text_tokens").alias("text_tokens"),
        F.sum("image_tokens").alias("image_tokens"),
        F.sum("n_tokens").alias("total_tokens"),
    )


_MIX_TARGETS = (("text", 0.7), ("image", 0.2), ("audio", 0.1))


def modality_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mm5 — MODALITY-BALANCED mixture report: total trainable tokens per
    modality (text = whitespace tokens, image = ViT patch tokens from the
    typed metadata, audio = wav2vec-style samples/hop frames), each
    modality's realized share of the token budget, its target share, and
    the resample rate (target/realized) a mixture-balancing sampler would
    apply — tx12's source-mixture arithmetic lifted to the modality axis,
    the knob a multimodal pre-training run actually sets.

    Scale: three independent single-scan aggregates (no joins between
    modalities — they union AFTER aggregation, 3 rows), then share
    arithmetic against the broadcast 1-row grand total. All token
    formulas are integer-exact in both engines."""
    from .text import _SPARK_NORM  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    text = docs.select(
        F.size(F.split(F.expr(_SPARK_NORM), " ")).cast("bigint").alias("t")
    ).groupBy().agg(
        F.lit("text").alias("modality"),
        F.count("*").cast("bigint").alias("n_items"),
        F.sum("t").alias("total_tokens"),
    )
    image = media_table(spark, sf_dir).select(
        (
            F.ceil(F.col("meta.width") / float(_MM_PATCH))
            * F.ceil(F.col("meta.height") / float(_MM_PATCH))
        ).cast("bigint").alias("t")
    ).groupBy().agg(
        F.lit("image").alias("modality"),
        F.count("*").cast("bigint").alias("n_items"),
        F.sum("t").alias("total_tokens"),
    )
    audio = docs.select(
        F.expr(
            f"CAST(FLOOR((1000 + (n_chars * 13) % 5000) / CAST({_MM_AUDIO_HOP} AS DOUBLE)) AS BIGINT)"
        ).alias("t")
    ).groupBy().agg(
        F.lit("audio").alias("modality"),
        F.count("*").cast("bigint").alias("n_items"),
        F.sum("t").alias("total_tokens"),
    )
    per_mod = text.unionByName(image).unionByName(audio)
    grand = per_mod.groupBy().agg(F.sum("total_tokens").alias("grand"))
    targets = spark.createDataFrame(list(_MIX_TARGETS), ["modality", "target_share"])
    share = F.col("total_tokens").cast("double") / F.col("grand")
    return (
        per_mod.crossJoin(F.broadcast(grand))
        .join(F.broadcast(targets), "modality")
        .select(
            "modality",
            "n_items",
            F.col("total_tokens").cast("bigint").alias("total_tokens"),
            F.round(share, 9).alias("token_share"),
            "target_share",
            F.round(F.col("target_share") / share, 9).alias("resample_rate"),
        )
    )


_MM_AUDIO_HOP = 320  # wav2vec-style samples per audio token


def _mm5_oracle() -> str:
    return f"""
        WITH text AS (
          SELECT 'text' AS modality, CAST(COUNT(*) AS BIGINT) AS n_items,
                 CAST(SUM(len(string_split(
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')))
                   AS BIGINT) AS total_tokens
          FROM documents),
        image AS (
          SELECT 'image', CAST(COUNT(*) AS BIGINT),
                 CAST(SUM(CEIL((16 + n_chars % 64) / {float(_MM_PATCH)})
                          * CEIL((16 + (n_chars * 7) % 48) / {float(_MM_PATCH)}))
                   AS BIGINT)
          FROM documents),
        audio AS (
          SELECT 'audio', CAST(COUNT(*) AS BIGINT),
                 CAST(SUM(FLOOR((1000 + (n_chars * 13) % 5000)
                                / CAST({_MM_AUDIO_HOP} AS DOUBLE))) AS BIGINT)
          FROM documents),
        per_mod AS (
          SELECT * FROM text UNION ALL SELECT * FROM image
          UNION ALL SELECT * FROM audio),
        grand AS (SELECT SUM(total_tokens) AS g FROM per_mod),
        targets(modality, target_share) AS (
          VALUES ('text', CAST(0.7 AS DOUBLE)),
                 ('image', CAST(0.2 AS DOUBLE)),
                 ('audio', CAST(0.1 AS DOUBLE)))
        SELECT p.modality, p.n_items, p.total_tokens,
               ROUND(p.total_tokens / CAST(g.g AS DOUBLE), 9) AS token_share,
               t.target_share,
               ROUND(t.target_share
                     / (p.total_tokens / CAST(g.g AS DOUBLE)), 9)
                 AS resample_rate
        FROM per_mod p CROSS JOIN grand g JOIN targets t USING (modality)"""


def _mm4_oracle() -> str:
    from .text import _DUCK_H, _DUCK_NORM  # noqa: PLC0415

    return f"""
        WITH d AS (
          SELECT doc_id,
                 CAST(len(string_split({_DUCK_NORM}, ' ')) AS BIGINT)
                   AS text_tokens,
                 CAST(ceil((16 + n_chars % 64) / {float(_MM_PATCH)})
                    * ceil((16 + (n_chars * 7) % 48) / {float(_MM_PATCH)})
                      AS BIGINT) AS image_tokens,
                 {_DUCK_H.format(x="CAST(doc_id AS VARCHAR)")}
                   % {_MM_PACK_SHARDS} AS shard
          FROM documents),
        s AS (
          SELECT *, LEAST(text_tokens + image_tokens, {_MM_PACK_BUDGET})
                      AS n_tokens
          FROM d),
        packed AS (
          SELECT *, SUM(n_tokens) OVER (PARTITION BY shard
                      ORDER BY n_tokens DESC, doc_id ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM s)
        SELECT shard,
               CAST((cum - 1) // {_MM_PACK_BUDGET} AS BIGINT) AS bin,
               COUNT(*) AS n_samples,
               CAST(SUM(text_tokens) AS BIGINT) AS text_tokens,
               CAST(SUM(image_tokens) AS BIGINT) AS image_tokens,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        FROM packed GROUP BY 1, 2"""


_MM6_TAU = 0.75     # min shared-chunk containment to report a pair
_MM6_MIN_SHARED = 3  # coincidence floor: short docs share tiny chunk sets
_MM6_BOUNDARY = 4   # a token opens a new chunk when md5(token) % 4 == 0


def frame_fp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mm6 — MEDIA NEAR-DUP via CONTENT-DEFINED CHUNKING (CDC): the
    payload stream is split at content-determined boundaries (a token
    whose hash ≡ 0 mod _MM6_BOUNDARY opens a chunk — the rsync/dedup-
    appliance trick), each chunk is fingerprinted, and two media items
    are near-duplicates when the smaller one's chunk set is mostly
    contained in the other's. Unlike fixed-offset framing, CDC is
    SHIFT-ROBUST: an insertion only rewrites the chunk it lands in, so
    trims/edits of one source still share every untouched chunk.

    Scale: chunking is a stateless projection + one windowed running sum
    per media (partition-local); the candidate join is ONE self-equi-join
    on the chunk fingerprint (bucketed, never all-pairs) — md5 keys are
    uniform, hot keys arise only from genuinely duplicated content. The
    same plan shape as dd14's text containment, on the media axis."""
    media = media_table(spark, sf_dir)
    toks = media.select(
        "media_id",
        F.posexplode(
            F.split(F.trim(F.decode("payload", "utf-8")), r"\s+")
        ).alias("pos", "word"),
    )
    bounded = toks.withColumn(
        "b",
        (
            F.expr(
                "CAST(conv(substring(md5(word), 1, 15), 16, 10) AS BIGINT)"
            )
            % _MM6_BOUNDARY
            == 0
        ).cast("bigint"),
    )
    w = Window.partitionBy("media_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    chunked = bounded.withColumn("chunk", F.sum("b").over(w))
    fps = (
        chunked.groupBy("media_id", "chunk")
        .agg(
            F.concat_ws(
                " ",
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, word))),"
                    " x -> x.word)"
                ),
            ).alias("content")
        )
        .select(
            "media_id",
            F.expr(
                "CAST(conv(substring(md5(content), 1, 15), 16, 10) AS BIGINT)"
            ).alias("fp"),
        )
        .distinct()
    )
    counts = fps.groupBy("media_id").agg(
        F.count("*").cast("bigint").alias("n_chunks")
    )
    shared = (
        fps.alias("a")
        .join(
            fps.alias("b"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .groupBy(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
        )
        .agg(F.count("*").cast("bigint").alias("shared_chunks"))
    )
    ca = counts.select(
        F.col("media_id").alias("media_a"), F.col("n_chunks").alias("n_chunks_a")
    )
    cb = counts.select(
        F.col("media_id").alias("media_b"), F.col("n_chunks").alias("n_chunks_b")
    )
    return (
        shared.join(ca, "media_a")
        .join(cb, "media_b")
        .withColumn(
            "containment",
            F.round(
                F.col("shared_chunks")
                / F.least("n_chunks_a", "n_chunks_b").cast("double"),
                9,
            ),
        )
        .filter(
            (F.col("containment") >= _MM6_TAU)
            & (F.col("shared_chunks") >= _MM6_MIN_SHARED)
        )
        .select(
            "media_a", "media_b", "shared_chunks", "n_chunks_a",
            "n_chunks_b", "containment",
        )
    )


ORACLES = {
    "mm4_multimodal_packing": _mm4_oracle(),
    "mm5_modality_mixture": _mm5_oracle(),
    "mm1_image_features": """
        SELECT doc_id AS media_id,
               16 + n_chars % 64 AS width,
               16 + (n_chars * 7) % 48 AS height,
               octet_length(CAST(text AS BLOB)) AS n_bytes,
               CAST(CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 256
                    AS DOUBLE) AS mean_luma
        FROM documents""",
    "mm3_audio_stats": """
        SELECT doc_id AS media_id,
               8000 + (n_chars % 3) * 4000 AS sample_rate,
               1000 + (n_chars * 13) % 5000 AS n_samples,
               CAST(1000 + (n_chars * 13) % 5000 AS DOUBLE)
                 / CAST(8000 + (n_chars % 3) * 4000 AS DOUBLE) * 1000.0 AS duration_ms,
               CAST(CAST(('0x' || substr(md5(text), 5, 4)) AS BIGINT) % 1000
                    AS DOUBLE) / 10.0 AS rms
        FROM documents""",
    "mm2_frame_samples": """
        SELECT doc_id AS media_id,
               frame_idx,
               CAST(('0x' || substr(md5(md5(text) || ':' ||
                     CAST(frame_idx AS VARCHAR)), 1, 8)) AS BIGINT) AS frame_fp
        FROM documents
        CROSS JOIN (SELECT unnest(range(0, 30, 5)) AS frame_idx)
        WHERE frame_idx < 1 + n_chars % 30""",
    # mm6: the same content-defined chunking over the payload text —
    # per-position boundary hash, running-sum chunk ids, chunk md5 fps,
    # then the containment self-join
    "mm6_frame_fp_neardup": f"""
        WITH d AS (
          SELECT doc_id AS media_id,
                 string_split_regex(trim(text), '\\s+') AS words
          FROM documents),
        toks AS (
          SELECT media_id, i AS pos, words[i] AS word
          FROM d, LATERAL (SELECT unnest(range(1, len(words) + 1)) AS i)),
        bounded AS (
          SELECT *, CASE WHEN CAST(('0x' || substr(md5(word), 1, 15))
                                   AS BIGINT) % {_MM6_BOUNDARY} = 0
                         THEN 1 ELSE 0 END AS b
          FROM toks),
        chunked AS (
          SELECT *, SUM(b) OVER (PARTITION BY media_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS chunk
          FROM bounded),
        fps AS (
          SELECT DISTINCT media_id,
                 CAST(('0x' || substr(md5(string_agg(word, ' ' ORDER BY pos)),
                       1, 15)) AS BIGINT) AS fp
          FROM chunked GROUP BY media_id, chunk),
        counts AS (
          SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_chunks
          FROM fps GROUP BY media_id),
        shared AS (
          SELECT a.media_id AS media_a, b.media_id AS media_b,
                 CAST(COUNT(*) AS BIGINT) AS shared_chunks
          FROM fps a JOIN fps b
            ON a.fp = b.fp AND a.media_id < b.media_id
          GROUP BY 1, 2)
        SELECT s.media_a, s.media_b, s.shared_chunks,
               ca.n_chunks AS n_chunks_a, cb.n_chunks AS n_chunks_b,
               ROUND(s.shared_chunks
                     / CAST(LEAST(ca.n_chunks, cb.n_chunks) AS DOUBLE), 9)
                 AS containment
        FROM shared s
        JOIN counts ca ON ca.media_id = s.media_a
        JOIN counts cb ON cb.media_id = s.media_b
        WHERE s.shared_chunks
              / CAST(LEAST(ca.n_chunks, cb.n_chunks) AS DOUBLE)
              >= {_MM6_TAU}
          AND s.shared_chunks >= {_MM6_MIN_SHARED}""",
}

SPARK_QUERIES = {
    "mm1_image_features": image_features,
    "mm2_frame_samples": frame_samples,
    "mm3_audio_stats": audio_stats,
    "mm4_multimodal_packing": multimodal_packing,
    "mm5_modality_mixture": modality_mixture,
    "mm6_frame_fp_neardup": frame_fp_neardup,
}


_MM7_BUDGET = 500  # frames per source per training epoch


def frame_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mm7 — FRAME-BUDGET APPORTIONMENT: a VLM training run affords
    ``_MM7_BUDGET`` decoded frames per source per epoch; mm7 splits each
    source's budget across its videos proportional to their frame
    counts using Hamilton's largest-remainder method — quota =
    floor(B * f_i / F_total), then the B - sum(quota) leftover frames
    go to the largest fractional remainders (ties to the lower
    media_id) — and caps every allocation at the video's actual frame
    count. mm2 samples frames uniformly per video; mm7 decides HOW MANY
    each video deserves under a hard decode budget — the allocator that
    runs before the sampler. Published per source: media/frame totals,
    the allocated sum, how many videos hit their cap, the min/max
    grant, and the realized budget fill in exact ppm (fill < 1e6 means
    the caps bound — the source has fewer frames than budget).

    Exactness: quotas, remainders (integer modulo), ranks, and caps are
    all BIGINT arithmetic; Hamilton extras = the sum of fractional
    parts < n_media, so the +1 rank test is always well-defined.

    Scale: one shuffle keyed on source (the groupBy and the
    remainder-rank window share it); per-source totals broadcast back;
    output is one row per source. The apportionment never materializes
    anything wider than the media table."""
    from ..corpus.corpus_sql import IDIV  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source",
        (1 + F.col("n_chars") % 30).cast("bigint").alias("n_frames"),
    )
    tot = docs.groupBy("source").agg(
        F.sum("n_frames").cast("bigint").alias("f_tot"),
        F.count("*").cast("bigint").alias("n_media"),
    )
    j = (
        docs.join(F.broadcast(tot), "source")
        .withColumn("num", F.lit(_MM7_BUDGET) * F.col("n_frames"))
        .withColumn("q0", F.expr(IDIV("num", "f_tot")))
        .withColumn("rem", F.col("num") % F.col("f_tot"))
    )
    floors = j.groupBy("source").agg(F.sum("q0").cast("bigint").alias("q0_sum"))
    w = Window.partitionBy("source").orderBy(F.desc("rem"), F.asc("doc_id"))
    alloc = (
        j.join(F.broadcast(floors), "source")
        .withColumn("rk", F.row_number().over(w))
        .withColumn(
            "alloc_raw",
            F.col("q0")
            + F.when(F.col("rk") <= F.lit(_MM7_BUDGET) - F.col("q0_sum"), 1)
            .otherwise(0),
        )
        .withColumn("alloc", F.least(F.col("alloc_raw"), F.col("n_frames")))
        .withColumn(
            "capped", (F.col("alloc_raw") > F.col("n_frames")).cast("bigint")
        )
    )
    return alloc.groupBy("source").agg(
        F.max("n_media").alias("n_media"),
        F.max("f_tot").alias("total_frames"),
        F.lit(_MM7_BUDGET).cast("bigint").alias("budget"),
        F.sum("alloc").cast("bigint").alias("n_alloc"),
        F.sum("capped").cast("bigint").alias("n_capped_media"),
        F.max("alloc").cast("bigint").alias("max_alloc"),
        F.min("alloc").cast("bigint").alias("min_alloc"),
    ).withColumn(
        "fill_ppm", F.expr(IDIV("n_alloc * 1000000", _MM7_BUDGET))
    )


def _mm7_oracle() -> str:
    from ..corpus.corpus_sql import IDIV  # noqa: PLC0415

    b = _MM7_BUDGET
    return f"""
        WITH d AS (
          SELECT doc_id, source,
                 CAST(1 + (n_chars % 30) AS BIGINT) AS n_frames
          FROM documents),
        tot AS (
          SELECT source, CAST(SUM(n_frames) AS BIGINT) AS f_tot,
                 CAST(COUNT(*) AS BIGINT) AS n_media
          FROM d GROUP BY source),
        j AS (
          SELECT d.*, t.f_tot, t.n_media,
                 CAST({b} * d.n_frames AS BIGINT) AS num,
                 {IDIV(f'{b} * d.n_frames', 't.f_tot')} AS q0,
                 CAST(({b} * d.n_frames) % t.f_tot AS BIGINT) AS rem
          FROM d JOIN tot t ON d.source = t.source),
        floors AS (
          SELECT source, CAST(SUM(q0) AS BIGINT) AS q0_sum
          FROM j GROUP BY source),
        alloc AS (
          SELECT j.source, j.n_media, j.f_tot, j.n_frames,
                 CASE WHEN ROW_NUMBER() OVER (PARTITION BY j.source
                                              ORDER BY j.rem DESC,
                                                       j.doc_id ASC)
                        <= {b} - f.q0_sum
                      THEN j.q0 + 1 ELSE j.q0 END AS alloc_raw
          FROM j JOIN floors f ON j.source = f.source),
        final AS (
          SELECT source, n_media, f_tot,
                 LEAST(alloc_raw, n_frames) AS alloc,
                 CASE WHEN alloc_raw > n_frames THEN 1 ELSE 0 END AS capped
          FROM alloc)
        SELECT source,
               MAX(n_media) AS n_media,
               MAX(f_tot) AS total_frames,
               CAST({b} AS BIGINT) AS budget,
               CAST(SUM(alloc) AS BIGINT) AS n_alloc,
               CAST(SUM(capped) AS BIGINT) AS n_capped_media,
               CAST(MAX(alloc) AS BIGINT) AS max_alloc,
               CAST(MIN(alloc) AS BIGINT) AS min_alloc,
               {IDIV('SUM(alloc) * 1000000', b)} AS fill_ppm
        FROM final GROUP BY source"""


ORACLES["mm7_frame_budget"] = _mm7_oracle()
SPARK_QUERIES["mm7_frame_budget"] = frame_budget
