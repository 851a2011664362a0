"""Round-7 session-4 queries: the incremental (streaming) near-dup
dedup path — continuous-ingest MinHash+LSH against a persisted band
index, the write-side twin of the batch dedup_minhash_lsh entry.

Reference parity note: the reference repo has no streaming surface; this
extends its dedup semantics (same shingle/minhash/LSH parameters as
dedup_minhash_lsh) to the arrival-ordered ingest shape a 100 TB
training-data pipeline actually runs. The oracle is the exact all-pairs
batch answer, so slice boundaries are proven not to leak into results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.bpe import bpe_oracle_sql, bpe_train
from ..streaming.pipeline import incremental_minhash_dedup
from .llm import _SCORED_CTE, _SHINGLE_CTE
from .registry import query, tables


@query(
    "incremental_minhash_dedup",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    {_SCORED_CTE},
    d AS (SELECT id_b, id_a,
                 ROUND(inter / (la + lb - inter), 4) AS jacc,
                 row_number() OVER (PARTITION BY id_b
                                    ORDER BY id_a) AS rn
          FROM scored
          WHERE inter / (la + lb - inter) >= 0.8)
    SELECT id_b AS doc_id, id_a AS rep_id, jacc AS rep_jacc
    FROM d WHERE rn = 1
    ORDER BY doc_id
    """,
)
def incremental_minhash_dedup_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming near-dup dedup: documents replay in 4 doc_id-ordered
    micro-batches; each batch LSH-joins against the persisted band index
    of all earlier arrivals, exact-verifies candidates at 0.8, and
    appends its own bands — O(batch + collisions) per ingest, the corpus
    text is never rescanned. Output: (dup doc, first-seen representative,
    exact Jaccard). Oracle = the all-pairs batch answer (LSH miss
    probability ≈ 1e-7 at s = 0.8; verification kills false positives),
    which also proves batch-boundary independence."""
    tables(spark, sf_dir)
    return incremental_minhash_dedup(
        spark, sf_dir, n_slices=4, files_per_trigger=2
    ).orderBy("doc_id")


@query("bpe_merge_training", oracle=bpe_oracle_sql(8))
def bpe_merge_training_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.py): 8 merge
    rounds over the (distinct word, frequency) vocab of the documents
    table — pair counting is a map-side-combined aggregate over the
    vocab (never the corpus), merge application a narrow fold, each
    round's winner a 1-row collect. Integer counts + lexicographic
    tie-breaks make the whole trajectory bit-reproducible against the
    hand-unrolled DuckDB rounds."""
    d = tables(spark, sf_dir)["documents"]
    return bpe_train(spark, d, "text", merges=8)


@query(
    "sequence_match_time_gap",
    oracle="""
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t, event_id
               FROM events WHERE event_type IN ('signup', 'purchase')),
    l AS (SELECT user_id, event_type, t,
                 lag(event_type) OVER w AS prev_type,
                 lag(t) OVER w AS prev_t
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
    per_user AS (SELECT user_id,
                        MAX(CASE WHEN event_type = 'purchase'
                                  AND prev_type = 'signup'
                                  AND t - prev_t <= 3600000000
                                 THEN 1 ELSE 0 END) AS matched
                 FROM l GROUP BY user_id),
    u AS (SELECT DISTINCT user_id FROM events)
    SELECT CAST(SUM(COALESCE(matched, 0)) AS BIGINT) AS n_matched,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(COALESCE(matched, 0)) AS DOUBLE) / COUNT(*), 6)
               AS rate
    FROM u LEFT JOIN per_user USING (user_id)
    """,
)
def sequence_match_time_gap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1)(?t<=3600)(?2)')(ts, signup,
    purchase)`` — the time-CONSTRAINED adjacency form the plain
    sequence_match / sequence_count_agg siblings don't cover: a purchase
    must DIRECTLY follow a signup (no relevant event between, per the
    same condition-subsequence interpretation as sequence_count_agg at
    ch_aggregates.py:915) and within one hour. One lag() pass over the
    (user, time) sort — single shuffle on user_id, no self-join; the
    oracle is the identical window restated in DuckDB."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    ev = tables(spark, sf_dir)["events"]
    e = ev.filter(F.col("event_type").isin("signup", "purchase")).select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("t"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    lagged = e.select(
        "user_id",
        "event_type",
        "t",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("t").over(w).alias("prev_t"),
    )
    hit = (
        (F.col("event_type") == "purchase")
        & (F.col("prev_type") == "signup")
        & (F.col("t") - F.col("prev_t") <= 3_600_000_000)
    )
    per_user = lagged.groupBy("user_id").agg(
        F.max(F.when(hit, 1).otherwise(0)).alias("matched")
    )
    levels = (
        ev.select("user_id")
        .distinct()
        .join(per_user, "user_id", "left")
        .select(F.coalesce("matched", F.lit(0)).alias("matched"))
    )
    return levels.agg(
        F.sum("matched").cast("long").alias("n_matched"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(
            F.sum("matched").cast("double") / F.count(F.lit(1)), 6
        ).alias("rate"),
    )


@query(
    "html_text_extraction",
    oracle="""
    WITH h AS (
        SELECT doc_id,
               '<html><head><script>var a=1;</script><style>p{color:red}'
               || '</style></head><body><h1>' || source || '</h1><p>'
               || text || '</p><!-- trailer --></body></html>' AS html,
               text
        FROM documents
    ),
    x AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(regexp_replace(
                    regexp_replace(regexp_replace(html,
                    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                    '(?s)<!--.*?-->', ' ', 'g'),
                    '<[^>]*>', ' ', 'g'),
                    '[ \\t\\n\\f\\r]+', ' ', 'g')) AS extracted,
               text
        FROM h
    )
    SELECT doc_id,
           CAST(length(extracted) AS BIGINT) AS n_extracted,
           substring(extracted, 1, 40) AS head,
           CASE WHEN position(
                    trim(regexp_replace(text, '[ \\t\\n\\f\\r]+', ' ', 'g'))
                    IN extracted) > 0
                THEN 1 ELSE 0 END AS body_preserved
    FROM x ORDER BY doc_id
    """,
)
def html_text_extraction_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``extractTextFromHTML`` (functions/ch.py): documents
    are rendered into a deterministic HTML wrapper (script + style +
    comment + tag noise around the real text), extracted back, and
    checked to preserve the whitespace-collapsed body — the HTML→text
    step an LLM ingestion pipeline runs before quality filtering. Pure
    map-side regex chain, byte-identical across Java regex and RE2."""
    import pyspark.sql.functions as F

    from ..functions.ch import CH_FUNCTIONS

    d = tables(spark, sf_dir)["documents"]
    html = F.concat(
        F.lit(
            "<html><head><script>var a=1;</script><style>p{color:red}"
            "</style></head><body><h1>"
        ),
        F.col("source"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p><!-- trailer --></body></html>"),
    )
    extracted = CH_FUNCTIONS["extractTextFromHTML"](html)
    norm_body = F.trim(F.regexp_replace("text", r"[ \t\n\f\r]+", " "))
    return d.select(
        "doc_id",
        F.length(extracted).cast("long").alias("n_extracted"),
        F.substring(extracted, 1, 40).alias("head"),
        F.when(F.instr(extracted, norm_body) > 0, 1)
        .otherwise(0)
        .alias("body_preserved"),
    ).orderBy("doc_id")


@query(
    "audio_wav_decode",
    oracle="""
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS L
               FROM documents),
    p AS (SELECT doc_id, 64 + L % 256 AS ns, 1 + L % 7 AS k FROM b),
    s AS (SELECT doc_id, ns, k,
                 list_transform(range(0, ns),
                                i -> abs((i * k) % 200 - 100) * 100) AS a
          FROM p)
    SELECT doc_id,
           ns::BIGINT                AS n_samples,
           CAST(8000 AS BIGINT)      AS sample_rate,
           CAST(1 AS BIGINT)         AS n_channels,
           CAST(list_max(a) AS BIGINT)  AS peak,
           CAST(list_sum(a) AS BIGINT)  AS sum_abs
    FROM s ORDER BY doc_id
    """,
)
def audio_wav_decode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end (operators/multimodal.py WAV path):
    synthesize a valid 16-bit mono PCM RIFF/WAVE file per document, then
    parse it back with the dependency-free chunk-walking decoder —
    extending the multimodal contract (real stdlib decode, arithmetic
    oracle) from images to audio. The oracle replays the sawtooth
    arithmetic: n = 64 + L%256 samples of ((i·k)%200−100)·100."""
    from ..operators.multimodal import decode_wav_features, encode_wav_payload

    d = tables(spark, sf_dir)["documents"]
    wav = encode_wav_payload(d, "doc_id", "text")
    return decode_wav_features(wav).orderBy("doc_id")


@query(
    "video_avi_frame_sample",
    oracle="""
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS L
               FROM documents),
    g AS (SELECT doc_id,
                 4 + 4 * (L % 4) AS w,
                 2 + L % 3       AS h,
                 3 + L % 5       AS nf
          FROM b)
    SELECT doc_id,
           nf::BIGINT                    AS n_frames,
           w::BIGINT                     AS width,
           h::BIGINT                     AS height,
           CAST(40000 AS BIGINT)         AS us_per_frame,
           (nf * w * h * 3)::BIGINT      AS total_frame_bytes,
           ((nf + 1) // 2)::BIGINT       AS n_sampled
    FROM g ORDER BY doc_id
    """,
)
def video_avi_frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container decode end-to-end: synthesize a valid
    uncompressed AVI per document (RIFF hdrl/strl/movi, consistent
    headers), parse it back with the dependency-free chunk walker, and
    sample every 2nd frame — completing the multimodal trio (PPM/BMP
    image, WAV audio, AVI video) with genuine parses. The oracle replays
    the geometry arithmetic from the text byte length."""
    from ..operators.multimodal import decode_avi_features, encode_avi_payload

    d = tables(spark, sf_dir)["documents"]
    avi = encode_avi_payload(d, "doc_id", "text")
    return decode_avi_features(avi, every_n=2).orderBy("doc_id")


@query(
    "generate_series_source",
    oracle="""
    SELECT CAST(v % 5 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(v) AS BIGINT) AS total
    FROM generate_series(0, 99999, 7) AS t(v)
    GROUP BY 1 ORDER BY 1
    """,
)
def generate_series_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generate_series TABLE FUNCTION exposed through Spark 4's
    Python DataSource API (sources/pyds.py): a registered
    ``spark.read.format("generate_series")`` source with partitioned
    parallel reads — the pluggable-source seam a production integration
    uses, not a driver-side spark.range rewrite. Aggregated mod-5 to
    check every generated value exactly once."""
    import pyspark.sql.functions as F

    from ..sources.pyds import register

    register(spark)
    s = (
        spark.read.format("generate_series")
        .option("start", 0)
        .option("stop", 99999)
        .option("step", 7)
        .load()
    )
    return (
        s.groupBy((F.col("value") % 5).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("value").cast("long").alias("total"),
        )
        .orderBy("bucket")
    )


@query(
    "udtf_sentence_split",
    oracle="""
    WITH p AS (SELECT doc_id,
                      regexp_replace(text,
                          '((?:[^ \\t\\n\\f\\r]+[ \\t\\n\\f\\r]+){7}'
                          || '[^ \\t\\n\\f\\r]+)[ \\t\\n\\f\\r]+',
                          '\\1. ', 'g') AS t
               FROM documents),
    a AS (SELECT doc_id,
                 list_filter(
                     list_transform(
                         regexp_extract_all(t, '[^.!?]+[.!?]*'),
                         x -> trim(x, ' ' || chr(9) || chr(10)
                                      || chr(12) || chr(13))),
                     x -> length(x) > 0) AS s
          FROM p),
    e AS (SELECT doc_id,
                 unnest(range(1, len(s) + 1)) AS i, s
          FROM a)
    SELECT doc_id,
           CAST(i - 1 AS BIGINT) AS sent_idx,
           substring(s[i], 1, 20) AS head,
           CAST(len(list_filter(
                    string_split_regex(s[i], '[ \\t\\n\\f\\r]+'),
                    x -> length(x) > 0)) AS BIGINT) AS n_words
    FROM e ORDER BY doc_id, sent_idx
    """,
)
def udtf_sentence_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered Python UDTF in SQL (functions/udtfs.py): LATERAL
    split_sentences(text) over documents — the SQL-visible table-function
    seam, one output row per sentence with order-stable indices. Runs as
    a real spark.sql statement, not a DataFrame helper."""
    import pyspark.sql.functions as F

    from ..functions.udtfs import register_udtfs

    tables(spark, sf_dir)
    register_udtfs(spark)
    # the synthetic corpus carries no punctuation — inject a period
    # after every 8th word (same regex both engines) so the split is
    # a real explode, then hand the UDTF the punctuated text
    out = spark.sql(
        r"SELECT d.doc_id, s.sent_idx, s.sentence, s.n_words "
        r"FROM (SELECT doc_id, regexp_replace(text, "
        r"'((?:[^ \\t\\n\\f\\r]+[ \\t\\n\\f\\r]+){7}"
        r"[^ \\t\\n\\f\\r]+)[ \\t\\n\\f\\r]+', '$1. ') AS t "
        r"FROM documents) d, LATERAL split_sentences(d.t) s"
    )
    return out.select(
        "doc_id",
        F.col("sent_idx").cast("long").alias("sent_idx"),
        F.substring("sentence", 1, 20).alias("head"),
        F.col("n_words").cast("long").alias("n_words"),
    ).orderBy("doc_id", "sent_idx")


@query(
    "streaming_series_source",
    oracle="""
    SELECT CAST(v % 3 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(v) AS BIGINT) AS total
    FROM generate_series(0, 4999, 1) AS t(v)
    GROUP BY 1 ORDER BY 1
    """,
)
def streaming_series_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Python DataSource (sources/pyds.py SeriesStream): a
    registered offset-tracked source replayed as micro-batches into a
    complete-mode aggregation; the query waits for the stream to drain
    (total count = interval size) and returns the final state — which is
    batch-timing-independent, so the batch oracle checks it exactly.
    Together with generate_series (batch) and split_sentences (UDTF)
    this covers Spark 4's Python extension-point surface."""
    import time
    import uuid as _uuid

    import pyspark.sql.functions as F

    from ..sources.pyds import register_streaming
    from ..streaming.pipeline import ckpt_dir, drop_stale_memory_tables

    register_streaming(spark)
    # chunk sizing: each Python-source micro-batch carries ~1 s of fixed
    # cost (worker round trip + complete-mode restate), so the replay
    # uses 2 data batches; drain semantics are chunk-count independent
    # (the whole point the oracle checks). availableNow is NOT usable
    # here: with a SimpleDataSourceStreamReader it processes only the
    # one prefetched batch (measured), hence the drain poll below.
    stream = (
        spark.readStream.format("series_stream")
        .option("start", 0)
        .option("stop", 4999)
        .option("chunk", 2500)
        .load()
    )
    agg = stream.groupBy(
        (F.col("value") % 3).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("value").cast("long").alias("total"),
    )
    name = f"series_stream_{_uuid.uuid4().hex[:8]}"
    drop_stale_memory_tables(spark, "series_stream")
    from ..functions.settings import query_settings

    # 3 output buckets: a 32-partition complete-mode restate per batch
    # is pure state-store commit overhead (r9 verdict #7 fixed-cost
    # audit) — 4 partitions, pinned at checkpoint creation.
    with query_settings(spark, {"spark.sql.shuffle.partitions": "4"}):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt_dir("seriesstream"))
            .outputMode("complete")
            .trigger(processingTime="10 milliseconds")
            .start()
        )
    try:
        deadline = time.time() + 120
        # Drain detection via progress metadata, not SQL polls: each
        # `SELECT SUM(n) FROM <mem table>` poll was a full Spark job
        # (~80 ms) racing the 50 ms trigger; recentProgress is a
        # driver-side dict read. Progress is reported after the batch
        # commits, so cumulative numInputRows = 5000 means the memory
        # sink already holds the drained state. recentProgress is a
        # bounded ring buffer (numRecentProgressUpdates, default 100),
        # so accumulate per-batchId outside the loop instead of summing
        # the buffer — a fast trigger can evict early batches (r12
        # advice).
        seen_batches: dict[int, int] = {}
        while time.time() < deadline:
            for p in q.recentProgress:
                seen_batches[p["batchId"]] = p["numInputRows"]
            if sum(seen_batches.values()) >= 5000:
                break
            time.sleep(0.02)
        else:
            raise TimeoutError("series_stream did not drain in 120 s")
    finally:
        q.stop()
    return spark.table(name).orderBy("bucket")


@query(
    "ch_r7_function_surface_6",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, event_type,
               (CAST(event_id AS BIGINT) * 7919 + 123) % 100000 AS n,
               0.5 + (event_id % 80) / 10.0 AS x,
               (event_id % 41 - 20) / 5.0 AS y,
               event_type || '-' || CAST(user_id AS VARCHAR) AS hs
        FROM events WHERE event_id % 20 = 11
    ),
    f AS (
        SELECT *,
               1.0 / (1.0 + 0.3275911 * abs(y)) AS t,
               list_reduce(
                   list_prepend('0',
                       [hs[i] for i in range(1, len(hs) + 1)]),
                   (acc, c) -> CAST((CAST(acc AS BIGINT) * 31 + ascii(c))
                                    % 4294967296 AS VARCHAR)
               )::BIGINT AS ju
        FROM e
    )
    SELECT event_id::BIGINT AS eid,
           array_to_string(
               list_filter(list_transform(range(0, 63),
                                          i -> (1::BIGINT << i)),
                           p -> (n & p) != 0), ',') AS bml,
           round(lgamma(x), 6) AS lg,
           round(gamma(x), 4) AS tg,
           round(sign(y) * (1 - (0.254829592*t - 0.284496736*t*t
                 + 1.421413741*t*t*t - 1.453152027*t*t*t*t
                 + 1.061405429*t*t*t*t*t) * exp(-abs(y)*abs(y))), 6) AS e_rf,
           round(1 - sign(y) * (1 - (0.254829592*t - 0.284496736*t*t
                 + 1.421413741*t*t*t - 1.453152027*t*t*t*t
                 + 1.061405429*t*t*t*t*t) * exp(-abs(y)*abs(y))), 6) AS e_rfc,
           CASE WHEN ju >= 2147483648 THEN ju - 4294967296
                ELSE ju END AS jh,
           ju % 2147483648 AS hh,
           CAST(len(list_filter(range(1, least(length(event_type),
                                               length(reverse(event_type)))
                                         + 1),
                    i -> event_type[i] != reverse(event_type)[i]))
                AS BIGINT) AS bhd,
           '<' || event_type || '="a&b">' AS xml_rt
    FROM f ORDER BY eid
    """,
)
def ch_r7_function_surface_6_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wave-13 names end-to-end: bitmaskToList against a DuckDB
    shift-table decompose, lgamma/tgamma (Lanczos g=7 Column series)
    against DuckDB's NATIVE lgamma/gamma — two independent
    implementations agreeing at 6/4 dp — erf/erfc (A&S 7.1.26, same
    formula both engines), javaHash/hiveHash against an independent
    DuckDB fold of the Java polynomial, byteHammingDistance vs the
    reversed string (palindromic prefix arithmetic; equal lengths so
    the length term drops), and decodeXMLComponent round-tripping its
    encode twin back to the original markup. 100 TB: map-only scalar
    surface, whole-stage codegen, no Python."""
    import pyspark.sql.functions as F

    from ..functions.ch import ch_expr
    from ..session import widen_scan

    ev = widen_scan(
        tables(spark, sf_dir)["events"].filter(F.col("event_id") % 20 == 11)
    )
    et = F.col("event_type")
    n = (F.col("event_id").cast("long") * 7919 + 123) % 100000
    x = F.lit(0.5) + (F.col("event_id") % 80) / F.lit(10.0)
    y = (F.col("event_id") % 41 - 20) / F.lit(5.0)
    hs = F.concat(et, F.lit("-"), F.col("user_id").cast("string"))
    xml = F.concat(F.lit("<"), et, F.lit('="a&b">'))
    return ev.select(
        F.col("event_id").cast("long").alias("eid"),
        ch_expr("bitmaskToList", n).alias("bml"),
        F.round(ch_expr("lgamma", x), 6).alias("lg"),
        F.round(ch_expr("tgamma", x), 4).alias("tg"),
        F.round(ch_expr("erf", y), 6).alias("e_rf"),
        F.round(ch_expr("erfc", y), 6).alias("e_rfc"),
        ch_expr("javaHash", hs).alias("jh"),
        ch_expr("hiveHash", hs).alias("hh"),
        ch_expr("byteHammingDistance", et, F.reverse(et)).alias("bhd"),
        ch_expr(
            "decodeXMLComponent", ch_expr("encodeXMLComponent", xml)
        ).alias("xml_rt"),
    ).orderBy("eid")


@query(
    "image_resize_real",
    oracle="""
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS L
               FROM documents),
    g AS (SELECT doc_id, L, 8 + L % 16 AS w, 8 + (L // 16) % 16 AS h
          FROM b),
    m AS (SELECT doc_id, w, h,
                 [round(list_sum(flatten(
                      [[CAST((7 * ((x * w) // 8) + 13 * ((y * h) // 8)
                              + 29 * c + L) % 256 AS DOUBLE)
                        for x in range(0, 8)]
                       for y in range(0, 8)])) / 64.0, 4)
                  for c in range(0, 3)] AS means
          FROM g)
    SELECT doc_id,
           w::BIGINT AS orig_w, h::BIGINT AS orig_h,
           means[1] AS mean_r, means[2] AS mean_g, means[3] AS mean_b
    FROM m ORDER BY doc_id
    """,
)
def image_resize_real_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize end-to-end (operators/multimodal.py
    resize_images_real — the upgrade of the byte-truncation stub):
    gradient P6 PPMs are decoded, nearest-neighbor resampled to 8x8,
    re-encoded as valid PPMs, and decoded AGAIN for per-channel means.
    The gradient fill makes the check position-sensitive — the oracle
    replays the exact (x*w)//8 index map, so a wrong resample (e.g. the
    old byte truncation) cannot hash-match."""
    import pyspark.sql.functions as F

    from ..operators.multimodal import (
        decode_features,
        encode_ppm_gradient,
        resize_images_real,
    )

    d = tables(spark, sf_dir)["documents"]
    src = encode_ppm_gradient(d, "doc_id", "text")
    # pin the expensive encode→resample lineage: both join branches
    # below read `resized`, and without the checkpoint each branch
    # would re-run the per-pixel Python work (same pattern as
    # operators/dist_rank.py)
    resized = resize_images_real(src, 8, 8).localCheckpoint()
    feats = decode_features(
        resized.select("doc_id", "payload"), strict=True
    ).select(
        "doc_id",
        F.round(F.element_at("features", 1), 4).alias("mean_r"),
        F.round(F.element_at("features", 2), 4).alias("mean_g"),
        F.round(F.element_at("features", 3), 4).alias("mean_b"),
    )
    return (
        resized.select("doc_id", "orig_w", "orig_h")
        .join(feats, "doc_id")
        .orderBy("doc_id")
    )


@query(
    "export_sharded_dataset",
    oracle="""
    WITH s AS (
        SELECT doc_id % 4 AS shard, doc_id, n_chars
        FROM documents
    ),
    g AS (
        SELECT shard,
               COUNT(*) AS n_rows,
               CAST(CEIL(COUNT(*) / 100.0) AS BIGINT) AS n_files,
               MIN(doc_id) AS min_id,
               MAX(doc_id) AS max_id,
               SUM(n_chars) AS total_chars,
               md5(string_agg(CAST(doc_id AS VARCHAR), ','
                              ORDER BY doc_id)) AS id_digest
        FROM s GROUP BY shard
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(n_rows AS BIGINT) AS n_rows, n_files,
           CAST(min_id AS BIGINT) AS min_id,
           CAST(max_id AS BIGINT) AS max_id,
           CAST(total_chars AS BIGINT) AS total_chars, id_digest
    FROM g ORDER BY shard
    """,
)
def export_sharded_dataset_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline TAIL step: export the curated corpus as
    size-bounded shards (partitionBy(shard) + maxRecordsPerFile=100,
    rows sorted within partitions so file splits are deterministic) and
    build a verifiable MANIFEST from what actually landed on disk — per
    shard: row/file counts read back from the written parquet, id range,
    payload bytes, and an order-independent-made-deterministic md5 over
    the sorted id list. The oracle recomputes every manifest field from
    the source table, so a dropped row, duplicated file, or misrouted
    shard cannot hash-match. 100 TB: shard = hash bucket (here id%4 for
    determinism), maxRecordsPerFile bounds file sizes for downstream
    loaders, manifest scan is footer/metadata-scale."""
    import glob as _glob
    import os as _os

    import pyspark.sql.functions as F

    from ..sources.io import scratch_path

    d = tables(spark, sf_dir)["documents"]
    sf_key = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    dest = scratch_path("export", sf_key, "shards")
    (
        d.select(
            "doc_id", "n_chars", (F.col("doc_id") % 4).alias("shard")
        )
        .repartition("shard")
        .sortWithinPartitions("doc_id")
        .write.partitionBy("shard")
        .option("maxRecordsPerFile", 100)
        .mode("overwrite")
        .parquet(dest)
    )
    back = spark.read.parquet(dest)
    files = spark.createDataFrame(
        [
            (int(p.split("shard=")[1].split(_os.sep)[0]),)
            for p in _glob.glob(_os.path.join(dest, "shard=*", "*.parquet"))
        ],
        "shard long",
    ).groupBy("shard").agg(F.count(F.lit(1)).alias("n_files"))
    manifest = (
        back.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.md5(
                F.array_join(F.array_sort(F.collect_list("doc_id")), ",")
            ).alias("id_digest"),
        )
        .join(files, "shard")
    )
    return manifest.select(
        F.col("shard").cast("long").alias("shard"),
        "n_rows",
        "n_files",
        "min_id",
        "max_id",
        "total_chars",
        "id_digest",
    ).orderBy("shard")
