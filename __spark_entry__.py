"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Design notes
------------
- The driver's testdata has NO nulls/duplicates, so operators whose whole
  point is missing/duplicate handling inject them DETERMINISTICALLY (e.g.
  ``l_orderkey % 7 = 0 → NULL``) on both the Spark side and inside the
  oracle SQL — the comparison then exercises the real operator semantics.
- Float-producing queries round computed columns (4-6 dp) on BOTH sides:
  Spark and DuckDB aggregate in different orders, so last-ulp differences
  are expected; the operators' math is otherwise identical.
- Timestamps are emitted as formatted strings (session-timezone pinned to
  UTC) to avoid cross-engine timezone/representation drift.
- Driver-side-algorithm operators (difflib fuzzy/spell, LSH banding) are
  either given a closed-form expected-value oracle (the injected typo's
  correction is known) or listed rows-only.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Callable

import pandas as pd  # noqa: F401 — pandas_udf type hints resolve in module globals
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataforge_spark import io as dfio
from dataforge_spark.dedup.exact import dedup_exact
from dataforge_spark.dedup.embedding import cosine_neardup_pairs, lsh_neardup_pairs
from dataforge_spark.dedup.components import connected_components
from dataforge_spark.dedup.minhash import minhash_dedup_pairs
from dataforge_spark.dedup.ngram_jaccard import jaccard_pairs
from dataforge_spark.dedup.simhash import simhash_pairs
from dataforge_spark.dedup.spans import span_dedup
from dataforge_spark.functions.text_analysis import (
    fingerprint,
    language_id,
    quality_score,
    regex_token_count,
    rolling_fingerprint,
    token_count,
)
from dataforge_spark.multimodal import attach_binary, binary_meta, extract_features
from dataforge_spark.operators.datetime_parsing import parse_datetime_columns
from dataforge_spark.operators.duplicates import drop_duplicates
from dataforge_spark.operators.encoding import encode_frequency, encode_label, encode_onehot
from dataforge_spark.operators.missing_values import fix_missing_values
from dataforge_spark.operators.normalization import (
    inverse_transform,
    normalize_data,
    scaling_statistics_df,
)
from dataforge_spark.operators.outliers import handle_outliers
from dataforge_spark.operators.text_cleaning import clean_text_columns
from dataforge_spark.operators.type_conversion import convert_data_types
from dataforge_spark.operators.typo_fix import fix_typos
from dataforge_spark.pipeline import CleaningPipeline
from dataforge_spark.profile import profile_df
from dataforge_spark.similarity.brute_force import cosine_topk
from dataforge_spark.similarity.lsh import lsh_cosine_topk
from dataforge_spark.streaming import (
    dedup_stream,
    profile_stream,
    read_events_stream,
    run_aggregate_to_memory,
    run_to_memory,
)

# ---------------------------------------------------------------------------
# shared builders (Spark) and CTEs (DuckDB) — the SAME deterministic null /
# typo injection on both sides
# ---------------------------------------------------------------------------

_PUNCT = r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~"""
_PUNCT_SQL = _PUNCT.replace("'", "''")
_URL_RE = r"http[s]?://(?:[a-zA-Z]|[0-9]|[$-_@.&+]|[!*\(\),]|(?:%[0-9a-fA-F][0-9a-fA-F]))+"
_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"

LI_SQL = """
SELECT l_orderkey, l_linenumber,
  CASE WHEN l_orderkey % 7 = 0 THEN NULL ELSE l_quantity END AS qty,
  CASE WHEN l_orderkey % 11 = 0 THEN NULL ELSE l_extendedprice END AS price,
  CASE WHEN l_orderkey % 13 = 0 THEN NULL ELSE l_returnflag END AS flag
FROM lineitem
"""

EV_SQL = """
SELECT event_id,
  CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS value
FROM events
"""


def _utc(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize ``events.ts`` to a plain UTC TIMESTAMP regardless of the
    parquet physical encoding. Generated data has shipped as both INT64
    TIMESTAMP(NANOS) (read as bigint under ``nanosAsLong``) and micros
    without timezone (read as TIMESTAMP_NTZ, which functions like
    ``unix_micros``/``window`` reject). Disabling ``inferTimestampNTZ``
    makes the reader surface naive parquet micros as TIMESTAMP holding the
    stored value as a UTC instant — identical to DuckDB's ``epoch_us`` on
    the same file and independent of the session timezone (a bare
    NTZ→TIMESTAMP cast would shift by the session offset instead —
    verified off-by-5h under America/New_York).

    get_spark() pins both confs (and UTC) at build time; they are
    re-asserted here because the DRIVER hands this function a stock
    session — and _utc() makes the NTZ fallback cast self-contained
    rather than dependent on the caller's session construction."""
    _utc(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(ev.dtypes).get("ts")
    if ts_type == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
    elif ts_type == "timestamp_ntz":
        # Conf not honored (unexpected): fall back to a cast, correct only
        # when the session timezone is UTC (get_spark pins it).
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev


def _li_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_orderkey") % 7 == 0, None).otherwise(F.col("l_quantity")).alias("qty"),
        F.when(F.col("l_orderkey") % 11 == 0, None).otherwise(F.col("l_extendedprice")).alias("price"),
        F.when(F.col("l_orderkey") % 13 == 0, None).otherwise(F.col("l_returnflag")).alias("flag"),
    )


def _ev_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.when(F.col("event_id") % 5 == 0, None).otherwise(F.col("value")).alias("value"),
    )


def _docs_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents plus a planted duplicate (doc_id+100000) of every 5th
    doc. Explode-planted in ONE scan — the old self-union read the
    parquet twice for the same rows (r8: exact-dedup leg 0.79 → 0.55 s
    at sf1); result set identical."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        F.explode(
            F.when(
                F.col("doc_id") % 5 == 0,
                F.array(F.col("doc_id"), F.col("doc_id") + 100000),
            ).otherwise(F.array(F.col("doc_id")))
        ).alias("doc_id"),
        "text",
    )


def _perturbed_embeddings(emb: DataFrame) -> DataFrame:
    """Deterministically-perturbed copy of every 10th vector: new id =
    vec_id + 100000, component i += 0.02*sin(new_id + i) — cos ≈ 0.9935
    to the original, ≤ ~0.52 to everything else. The same formula is
    closed-form in the DuckDB oracles (list_transform + sin)."""
    def perturb(vec):
        return F.transform(
            vec, lambda x, i: x + 0.02 * F.sin((F.col("vec_id") + i).cast("double"))
        )

    return (
        emb.where(F.col("vec_id") % 10 == 0)
        .select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
        .select("vec_id", perturb(F.col("embedding")).alias("embedding"))
    )


# Streaming file-source inputs are materialized ONCE per (session, sf_dir)
# and reused — repeated runs (bench warm-up + timed run) must not re-write
# the input copy inside the timed region.
_STREAM_INPUTS: dict[tuple[int, str, str], str] = {}


def _stream_input_path(spark: SparkSession, sf_dir: str, tag: str, build) -> str:
    key = (id(spark), sf_dir, tag)
    if key not in _STREAM_INPUTS:
        path = f"/tmp/dataforge_stream_{tag}_{uuid.uuid4().hex[:8]}"
        build().coalesce(8).write.mode("overwrite").parquet(path)
        _STREAM_INPUTS[key] = path
    return _STREAM_INPUTS[key]


def prewarm_stream_inputs(spark: SparkSession, sf_dir: str) -> None:
    """Called by bench.py's (untimed) warm-up so the stream queries' input
    copies are off the clock."""
    ev = _events(spark, sf_dir)
    _stream_input_path(spark, sf_dir, "ev", lambda: ev)
    _stream_input_path(
        spark, sf_dir, "dup",
        lambda: ev.unionByName(ev.where(F.col("event_id") % 10 == 0)),
    )


# ---------------------------------------------------------------------------
# entry — flagship: full cleaning pipeline over lineitem at sf0.001
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the canonical-order cleaning pipeline (SURVEY §3)
    over lineitem — missing-value fill, dedup, outlier cap, minmax scale."""
    _utc(spark)
    df = dfio.with_row_id(_t(spark, "/root/testdata/sf0.001", "lineitem"))
    out, _report = CleaningPipeline(collect_metrics=False).run(
        df,
        {
            "missing_values": {"enabled": True, "strategy": "fill_median"},
            "duplicates": {"enabled": True},
            "outliers": {"enabled": True, "method": "iqr", "action": "cap",
                         "columns": ["l_quantity", "l_extendedprice"]},
            "normalization": {"enabled": True, "method": "minmax",
                              "columns": ["l_quantity", "l_extendedprice"]},
        },
    )
    return out.drop(dfio.ROW_ID)


# ---------------------------------------------------------------------------
# queries — one per implemented operator
# ---------------------------------------------------------------------------


def q_s1_io_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2 source+sink contract as one tagged union (round 10 — the
    former ``s1_csv_roundtrip`` row widened to attest every structured
    text/columnar format the engine ships, VERDICT r9 task 2): the SAME
    events frame round-trips through

    - ``csv``:   write_csv → read_csv (the reference's only format);
    - ``jsonl``: write_jsonl (gzip parts) → read_jsonl with an injected
      corrupt-line file — the two malformed lines land whole in the
      quarantine column instead of vanishing (PERMISSIVE +
      columnNameOfCorruptRecord), and ``n_corrupt`` counts them while
      the valid-row stats exclude them;
    - ``orc``:   write_orc (zstd) → read_orc;
    - ``avro``:  write_avro (deflate OCF, pure-Python wire format —
      `dataforge_spark/avro.py`) → read_avro (binaryFile +
      mapInPandas block decode) — round 10;
    - ``avro_arr`` (round 11): the EMBEDDINGS table — ``vec_id bigint,
      embedding array<float>, label int`` — through snappy-codec Avro,
      attesting the complex-type encoding (block-framed arrays) and
      the snappy block codec; the checksum folds every float element
      (exact 4-byte IEEE round-trip, cast to double before summing);
    - ``tfrecord`` (round 11): write_tfrecord (CRC32C-masked framing +
      tf.Example protobuf, ``dataforge_spark/tfrecord.py``) →
      read_tfrecord — gzip parts, ``double_mode="bytes"`` so the
      double checksum is exact (nulls ride the omitted-feature
      convention and are counted by the valid-row stats unchanged);
    - ``warc`` (round 11): the DOCUMENTS table as WET-style
      ``conversion`` records (``dataforge_spark/warc.py``, ISO 28500
      wire format, per-record gzip members à la Common Crawl) —
      write_warc with URI/language/custom-source headers, read back,
      warcinfo head records excluded by type; ``sum_value`` is the
      total payload byte count, which must equal the table's total
      text octets.

    Each leg emits the same summary (row count, value checksum,
    distinct counts), so one oracle row proves all seven sinks
    preserve the data and all seven scans read it back losslessly."""
    ev = _events(spark, sf_dir).select("event_id", "event_type", "value", "props")
    run = uuid.uuid4().hex[:8]

    def _leg(variant: str, back, corrupt_col: str | None = None):
        valid = (
            F.count(F.when(F.col(corrupt_col).isNull(), F.lit(1)))
            if corrupt_col
            else F.count(F.lit(1))
        )
        n_corrupt = (
            F.count(F.col(corrupt_col)) if corrupt_col
            else F.count(F.when(F.lit(False), F.lit(1)))
        )
        return back.agg(
            valid.alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.count_distinct("props").alias("n_props"),
            F.count_distinct("event_type").alias("n_types"),
            n_corrupt.alias("n_corrupt"),
        ).withColumn("variant", F.lit(variant))

    csv_path = f"/tmp/dataforge_csv_{run}"
    dfio.write_csv(ev, csv_path)
    csv_leg = _leg("csv", dfio.read_csv(spark, csv_path, row_id=False))

    jsonl_path = f"/tmp/dataforge_jsonl_rt_{run}"
    dfio.write_jsonl(ev, jsonl_path, compression="gzip")
    with open(os.path.join(jsonl_path, "part-corrupt.json"), "w") as fh:
        fh.write('{"event_id": 1, "event_type": broken\n')
        fh.write('not json at all\n')
    ddl = "event_id bigint, event_type string, value double, props string"
    jsonl_leg = _leg(
        "jsonl",
        dfio.read_jsonl(spark, jsonl_path, schema=ddl, corrupt_col="_corrupt"),
        corrupt_col="_corrupt",
    )

    orc_path = f"/tmp/dataforge_orc_{run}"
    dfio.write_orc(ev, orc_path)
    orc_leg = _leg("orc", dfio.read_orc(spark, orc_path, row_id=False))

    from dataforge_spark.avro import read_avro, write_avro

    avro_path = f"/tmp/dataforge_avro_{run}"
    write_avro(ev, avro_path, codec="deflate")
    avro_leg = _leg("avro", read_avro(spark, avro_path))

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb_avro_path = f"/tmp/dataforge_avro_arr_{run}"
    write_avro(emb, emb_avro_path, codec="snappy")
    emb_back = read_avro(spark, emb_avro_path)
    avro_arr_leg = emb_back.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(
                F.aggregate(
                    "embedding",
                    F.lit(0.0).cast("double"),
                    lambda acc, x: acc + x.cast("double"),
                )
            ),
            2,
        ).alias("sum_value"),
        F.count_distinct(F.size("embedding")).alias("n_props"),
        F.count_distinct("label").alias("n_types"),
        F.count(F.when(F.lit(False), F.lit(1))).alias("n_corrupt"),
    ).withColumn("variant", F.lit("avro_arr"))

    from dataforge_spark.tfrecord import read_tfrecord, write_tfrecord

    tfr_path = f"/tmp/dataforge_tfrec_{run}"
    write_tfrecord(ev, tfr_path, compression="gzip", double_mode="bytes")
    tfr_leg = _leg(
        "tfrecord",
        read_tfrecord(
            spark, tfr_path,
            "event_id bigint, event_type string, value double, props string",
            double_mode="bytes",
        ),
    )

    from dataforge_spark.warc import read_warc, write_warc

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    warc_path = f"/tmp/dataforge_warc_{run}"
    write_warc(
        docs.withColumn(
            "uri", F.concat(F.lit("http://example.com/doc/"), F.col("doc_id"))
        ),
        warc_path,
        payload_col="text",
        uri_col="uri",
        language_col="lang",
        extra_header_cols={"X-DataForge-Source": "source"},
    )
    warc_back = read_warc(spark, warc_path).filter(
        F.col("warc_type") == "conversion"
    )
    warc_leg = warc_back.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("content_length").cast("double")), 2).alias(
            "sum_value"
        ),
        F.count_distinct("target_uri").alias("n_props"),
        F.count_distinct("language").alias("n_types"),
        F.count(F.when(F.lit(False), F.lit(1))).alias("n_corrupt"),
    ).withColumn("variant", F.lit("warc"))

    return (
        csv_leg.unionByName(jsonl_leg).unionByName(orc_leg)
        .unionByName(avro_leg).unionByName(avro_arr_leg)
        .unionByName(tfr_leg).unionByName(warc_leg)
    )


def q_s4_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 profiler + T7 memory report in one row set (round 4): the
    profile rows carry each column's estimated bytes (fixed width ×
    rows for numerics, exact summed octet lengths for strings) — the
    T7 contract, oracle-recomputed in SQL."""
    from dataforge_spark.profile import memory_report

    ev = _events(spark, sf_dir).select(
        "event_id",
        F.when(F.col("event_id") % 7 == 0, None).otherwise(F.col("value")).alias("value"),
        F.when(F.col("event_id") % 11 == 0, F.lit("unknown")).otherwise(F.col("props")).alias("props"),
    )
    prof = profile_df(ev, columns=["value", "props"])
    mem = memory_report(ev)["columns"]
    mem_map = F.create_map(
        F.lit("value"), F.lit(int(mem["value"])),
        F.lit("props"), F.lit(int(mem["props"])),
    )
    return prof.withColumn(
        "est_bytes", mem_map[F.col("col_name")].cast("bigint")
    )


def q_m1_m2_drop_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 (drop any-null rows) + M2 (threshold variant) as one tagged
    union — both strategies attested in a single driver row."""
    df = _li_nulls(spark, sf_dir)
    a = fix_missing_values(df, "drop_rows", columns=["qty", "price", "flag"])
    b = fix_missing_values(df, "drop_rows_threshold", threshold=0.75,
                           columns=["qty", "price", "flag"])
    return a.withColumn("variant", F.lit("drop_rows")).unionByName(
        b.withColumn("variant", F.lit("threshold"))
    )


def q_m3_m4_drop_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 (drop all-null-gap columns) + M4 (threshold variant). The
    interesting OUTPUT of a column-dropping op is which columns survive
    (values pass through untouched), so the row is a per-variant summary:
    surviving column list + row count. Non-null fractions at sf0.01:
    qty 0.855, price 0.910, flag 0.924 — threshold 0.88 drops qty only."""
    df = _li_nulls(spark, sf_dir)
    a = fix_missing_values(df, "drop_columns", columns=["qty", "price", "flag"])
    b = fix_missing_values(df, "drop_columns_threshold", threshold=0.88,
                           columns=["qty", "price", "flag"])
    rows = [
        ("drop_columns", ",".join(a.columns), a.count()),
        ("threshold_0.88", ",".join(b.columns), b.count()),
    ]
    return spark.createDataFrame(
        rows, "variant string, kept_cols string, n_rows bigint"
    )


def q_m5_m6_fill_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 mean-fill + M6 exact-median-fill as one tagged union (both
    strategies attested in a single driver row).

    r7 formulation (same trick as o6_o7): the three target columns are
    duplicated and BOTH operator calls chain on one frame — mean-fill on
    the originals, median-fill on the copies — then one explode emits
    the tagged union. The old two-frame union scanned lineitem twice
    for the output (Spark does not merge union branches into one scan).
    Stats jobs are unchanged: each fill's aggregates read only its own
    columns. (No rebalance before the explode: measured a wash — the
    fills are trivial coalesce projections, so a repartition shuffle
    costs what the single-core explode costs.)"""
    df = _li_nulls(spark, sf_dir).select(
        "*",
        F.col("qty").alias("qty_m"),
        F.col("price").alias("price_m"),
    )
    a = fix_missing_values(df, "fill_mean", columns=["qty", "price", "flag"])
    # Both variants mode-fill the categorical column from the SAME data,
    # so the median variant's flag is definitionally identical to the
    # mean variant's — copying it after the first fill skips a second
    # modes job (melt + agg + window) over identical values. The
    # median-side categorical branch is the same `if cat:` code path the
    # mean call just exercised.
    b = fix_missing_values(
        a.withColumn("flag_m", F.col("flag")), "fill_median",
        columns=["qty_m", "price_m"],
    )
    return b.select(
        "l_orderkey", "l_linenumber",
        F.explode(F.array(
            F.struct(F.lit("mean").alias("variant"),
                     F.round("qty", 4).alias("q"),
                     F.round("price", 4).alias("p"),
                     F.col("flag").alias("f")),
            F.struct(F.lit("median").alias("variant"),
                     F.round("qty_m", 4).alias("q"),
                     F.round("price_m", 4).alias("p"),
                     F.col("flag_m").alias("f")),
        )).alias("o"),
    ).select(
        F.col("o.variant").alias("variant"), "l_orderkey", "l_linenumber",
        F.col("o.q").alias("qty"), F.col("o.p").alias("price"),
        F.col("o.f").alias("flag"),
    )


def q_m7_fill_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _li_nulls(spark, sf_dir)
    out = fix_missing_values(df, "fill_mode", columns=["qty", "price", "flag"])
    return out.select(
        "l_orderkey", "l_linenumber",
        F.round("qty", 4).alias("qty"), F.round("price", 4).alias("price"), "flag",
    )


def q_m8_m9_ordered_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 forward-fill + M9 backward-fill in one row: two independently
    null-injected copies of the value column, ffilled and bfilled
    respectively in event_id order.

    CHAINED over one frame, not two subplans joined on the key: the
    second fill's statistics jobs (order-key sketch, bucket edges) read
    only event_id and the bfill column, so Catalyst's column pruning
    deletes the first fill's window from those plans entirely — the
    join formulation paid a 1M×1M sort-merge join for nothing
    (measured 3.8 → 1.8 s at sf1, hash-identical output)."""
    ev = _events(spark, sf_dir)
    both = ev.select(
        "event_id",
        F.when(F.col("event_id") % 5 == 0, None)
        .otherwise(F.col("value")).alias("value"),
        F.when(F.col("event_id") % 7 == 0, None)
        .otherwise(F.col("value")).alias("value_bf"),
    )
    out = fix_missing_values(
        fix_missing_values(both, "forward_fill", columns=["value"],
                           order_col="event_id"),
        "backward_fill", columns=["value_bf"], order_col="event_id",
    )
    return out.select(
        "event_id",
        F.round("value", 2).alias("value"),
        F.round("value_bf", 2).alias("value_bf"),
    )


def q_d1_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    out = drop_duplicates(orders, subset=["o_custkey"], keep="first", order_col="o_orderkey")
    return out.select("o_orderkey", "o_custkey", "o_totalprice")


def q_o1_iqr_remove(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice")
    return handle_outliers(li, columns=["l_extendedprice"], method="iqr",
                           action="remove", threshold=1.5)


def q_o2_o3_robust_remove(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 z-score remove + O3 modified-z-score (MAD) remove as a tagged
    union (O8 detect_outliers shares the z-score stats path; pytest covers
    its report shape)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice")
    a = handle_outliers(li, columns=["l_extendedprice"], method="zscore",
                        action="remove", threshold=2.5)
    b = handle_outliers(li, columns=["l_extendedprice"], method="modified_zscore",
                        action="remove", threshold=3.5)
    return a.withColumn("variant", F.lit("zscore")).unionByName(
        b.withColumn("variant", F.lit("mzscore"))
    )


def q_o6_o7_outlier_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 (IQR cap/winsorize) + O7 (log1p transform of positives) as one
    tagged union — both outlier ACTIONS attested in a single driver row.

    r7 formulation (VERDICT r6 task 5): the price column is duplicated
    and BOTH handle_outliers actions run on one frame — cap on the
    original, transform on the copy — then one explode emits the tagged
    union. The old two-frame union scanned lineitem twice and Spark
    does not merge union branches into one scan; this pays one scan and
    one bounds job (the transform leg never needed bounds at all)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    ).withColumn("lep_log", F.col("l_extendedprice"))
    both = handle_outliers(
        handle_outliers(li, columns=["l_extendedprice"], method="iqr",
                        action="cap", threshold=1.5),
        columns=["lep_log"], method="iqr", action="transform",
    )
    # (measured: rebalancing before the explode is a wash here — the
    # per-row work is a trivial when/round projection, so a repartition
    # shuffle costs as much as the single-core explode it parallelizes;
    # ensure_parallelism only pays for CPU-bound kernels)
    return both.select(
        "l_orderkey", "l_linenumber",
        F.explode(F.array(
            F.struct(F.lit("cap").alias("op"),
                     F.round("l_extendedprice", 4).alias("v")),
            F.struct(F.lit("log").alias("op"),
                     F.round("lep_log", 6).alias("v")),
        )).alias("o"),
    ).select(
        F.col("o.op").alias("op"), "l_orderkey", "l_linenumber",
        F.col("o.v").alias("l_extendedprice"),
    )


def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (temporal) join — relational.asof_join: every event picks up
    the user's most recent 'status' event (every 20th event, deduped to
    one row per (user, time) for deterministic ties). Times compared as
    integer MICROSECONDS on both sides (events.parquet is nanos; Spark
    truncates to micros at read, the oracle truncates identically), so
    the join condition is bit-exact across engines. The union-and-carry
    plan pays ONE exchange and no row amplification — the DuckDB oracle
    is its native ASOF LEFT JOIN."""
    from dataforge_spark.relational import asof_join

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    # deterministic ties (one status per (user, time), max event_id wins)
    # via the carry window's tie_breakers — the explicit groupBy dedup
    # this leg used to run cost an extra exchange (0.58 s of a 1.4 s sf1
    # row) for the same result.
    status = ev.where(F.col("event_id") % 20 == 0).select(
        "user_id", "us",
        F.col("event_id").alias("status_id"),
        F.col("us").alias("s_us"),
    )
    out = asof_join(ev, status, on="us", by=["user_id"],
                    right_cols=["status_id", "s_us"],
                    tie_breakers=["status_id"])
    return out.select("event_id", "user_id", "us", "status_id", "s_us")


def q_t1_manual_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "event_id", F.col("value").cast("string").alias("sval")
    )
    return convert_data_types(ev, type_mapping={"sval": "float64"}, auto_detect=False)


def q_t234_auto_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 auto-numeric (both the double path and the all-integral→Int64
    rule), T3 auto-datetime, T4 auto-boolean — one auto_detect pass over
    four stringified columns — plus the T6 residual-stringify leg
    (manual cast map to str, auto_detect off) chained on the same frame,
    so one driver row attests T2/T3/T4/T6 together.

    r14 (guide §2.4 remove shuffles outright): the T6 leg used to be a
    SECOND read of events joined back on event_id — a 1M×1M sort-merge
    join (2 exchanges + sorts) whose two sides are row-wise projections
    of the SAME table on a unique key. Carrying the raw bigint user_id
    THROUGH the auto-detect call (auto-detection only touches string
    columns, and the detect scan column-prunes to them, so detection
    sees identical input) and applying the same manual
    ``{'user_id': 'str'}`` conversion to the combined frame yields the
    identical rows with zero joins: the whole apply phase is one
    projection over one scan. Oracle-verified identical (tuned gate)."""
    _utc(spark)
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.col("value").cast("string").alias("num_str"),
        F.col("user_id").cast("string").alias("int_str"),
        F.date_format("ts", "yyyy-MM-dd").alias("dt_str"),
        F.when(F.col("event_id") % 2 == 0, F.lit("yes")).otherwise(F.lit("no")).alias("b_str"),
        "user_id",
    )
    out = convert_data_types(ev, auto_detect=True)
    t6 = convert_data_types(
        out, type_mapping={"user_id": "str"}, auto_detect=False,
    )
    return t6.select(
        "event_id", "num_str", "int_str",
        F.date_format("dt_str", "yyyy-MM-dd HH:mm:ss").alias("dt_str"), "b_str",
        F.col("user_id").alias("str_col"),
    )


def q_x_text_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 12 X text-cleaning ops + X11 custom patterns in ONE row set:
    the x1 composite (lowercase/html/urls/emails/numbers/punctuation/
    extra_spaces) on ``messy``, the remaining ops (uppercase,
    remove_special_chars, remove_whitespace) on ``t``, custom patterns on
    ``text``; X12 ''→NULL applies to every column. Round 4 adds the PII
    redaction leg (functions/pii.redact_pii) on a planted-entity column —
    RE2-portable kinds only (PHONE and CARD need lookarounds DuckDB lacks), so
    the oracle recomputes the identical regexp_replace chain.

    Round 11 adds the HTML-extraction leg (``functions/html.py``, a
    real parser — not the X-ops' tag-strip regex): each doc wrapped in
    a deterministic page (head/title/style boilerplate, entity refs, a
    link), then ``html_to_text`` / ``html_title`` / ``html_links``
    must recover the closed forms the oracle recomputes — the style
    subtree dropped, the entity decoded, block boundaries as newlines,
    the href harvested."""
    from dataforge_spark.functions.html import html_extract
    from dataforge_spark.functions.pii import redact_pii

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("  <b>Hello "), F.col("text"),
            F.lit("</b> visit https://ex.com/a?b=1 mail a.b@ex.com 42 cats!  "),
        ).alias("messy"),
        F.concat(F.lit("  a-1 "), F.col("text"), F.lit(" z*9  ")).alias("t"),
        "text",
        redact_pii(
            F.concat(
                F.lit("mail a.b@ex.com see https://x.io/p ssn 123-45-6789 ip 10.0.0.1 "),
                F.col("text"),
            ),
            kinds=["EMAIL", "URL", "SSN", "IP"],
        ).alias("pii_red"),
        F.concat(
            F.lit('<html><head><title>Doc '), F.col("doc_id"),
            F.lit('</title><style>b{color:red}</style></head><body><div>'),
            F.col("text"),
            F.lit('</div><p>from &amp; via</p><a href="http://l/'),
            F.col("doc_id"), F.lit('">x</a></body></html>'),
        ).alias("page"),
    )
    ext = html_extract("page")  # ONE parse for all three fields
    docs = docs.select(
        "doc_id", "messy", "t", "text", "pii_red",
        ext["text"].alias("html_txt"),
        ext["title"].alias("html_title"),
        F.array_join(ext["links"], ",").alias("html_links"),
    )
    out = clean_text_columns(
        docs,
        columns=["messy"],
        operations=["lowercase", "remove_html", "remove_urls", "remove_emails",
                    "remove_numbers", "remove_punctuation", "remove_extra_spaces"],
    )
    out = clean_text_columns(
        out, columns=["t"],
        operations=["uppercase", "remove_special_chars", "remove_whitespace"],
    )
    return clean_text_columns(
        out, columns=["text"], operations=["lowercase"],
        custom_patterns={r"\bspark\b": "SPARK"},
    )


def q_dt1_datetime_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    od = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("od_str")
    )
    out = parse_datetime_columns(od, columns=["od_str"], extract_features=True)
    return out.select(
        "o_orderkey",
        F.date_format("od_str", "yyyy-MM-dd HH:mm:ss").alias("od_ts"),
        "od_str_year", "od_str_month", "od_str_day",
    )


def q_e1_e3_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 label encode (sorted codes) + E3 frequency encode, joined on
    c_custkey so one driver row attests both encoders."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    lab, _ = encode_label(cust, columns=["c_mktsegment"])
    lab = lab.select("c_custkey", F.col("c_mktsegment").alias("seg_label"))
    freq = encode_frequency(cust, columns=["c_mktsegment"])
    return lab.join(freq, "c_custkey")


def q_e2_onehot_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 get_dummies parity, BOTH variants in one row: full dummy set on
    c_mktsegment, drop_first on a second copy of the same column."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", F.col("c_mktsegment").alias("seg2")
    )
    out = encode_onehot(cust, columns=["c_mktsegment"])
    return encode_onehot(out, columns=["seg2"], drop_first=True)




def q_y1_common_typos(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("Teh goverment will recieve the managment report. "),
                 F.col("text")).alias("msg"),
    )
    return fix_typos(docs, columns=["msg"], method="common_typos")


def q_y2_y3_difflib_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y2 fuzzy-match + Y3 spell-check on two independently typo-injected
    copies of event_type (closed-form corrections: clickk→click,
    vieww→view)."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.when(F.col("event_id") % 97 == 0, F.lit("clickk"))
        .otherwise(F.col("event_type")).alias("et_f"),
        F.when(F.col("event_id") == 500, F.lit("vieww"))
        .otherwise(F.col("event_type")).alias("et_s"),
    )
    out = fix_typos(ev, columns=["et_f"], method="fuzzy_match", similarity_threshold=0.8)
    return fix_typos(out, columns=["et_s"], method="spell_check", similarity_threshold=0.8)


def q_y2_lsh_fuzzy_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y2 SCALE path: the synthetic domain (md5-prefix categories + a
    trailing-'x' typo on every 13th customer) exceeds ``max_distinct``, so
    fuzzy_match runs char-3-gram MinHash LSH candidate generation
    (typo_fix._lsh_fuzzy_map) instead of the O(u²) driver loop. The
    outcome is closed-form: every typo value unifies to its base (the base
    is strictly more frequent; distinct md5 prefixes are nowhere near the
    0.8 difflib threshold, so nothing else merges) — the oracle just
    recomputes the base for every row."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    base = F.substring(F.md5((F.col("c_custkey") % 40).cast("string")), 1, 12)
    df = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 13 == 0, F.concat(base, F.lit("x")))
        .otherwise(base)
        .alias("seg"),
    )
    rep: dict = {}
    out = fix_typos(
        df, columns=["seg"], method="fuzzy_match",
        similarity_threshold=0.8, max_distinct=50, report=rep,
    )
    assert rep["seg"]["method"] == "lsh_approx", rep
    return out


def q_y4_typo_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataforge_spark.operators.typo_fix import typo_statistics

    docs = _t(spark, sf_dir, "documents")
    out = typo_statistics(docs, columns=["text", "lang", "source"])
    return out.select(
        "col_name", "unique_values", "total_values",
        F.round("uniqueness_ratio", 6).alias("uniqueness_ratio"),
        F.round("avg_length", 4).alias("avg_length"),
        F.round("length_variance", 4).alias("length_variance"),
    )


_NCOLS = ["l_quantity", "l_extendedprice"]


def q_n1_n5_standard_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1 standard scale + N5 inverse_transform of the SAME fit, as a
    tagged union (variant 'standard' = scaled values, 'inverse' = values
    recovered from the scaled ones — must equal the input)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", *_NCOLS)
    scaled, params = normalize_data(li, columns=_NCOLS, method="standard")
    inv = inverse_transform(scaled, params)
    a = scaled.select(
        "l_orderkey", "l_linenumber",
        F.round("l_quantity", 6).alias("v_qty"),
        F.round("l_extendedprice", 6).alias("v_price"),
    ).withColumn("variant", F.lit("standard"))
    b = inv.select(
        "l_orderkey", "l_linenumber",
        F.round("l_quantity", 4).alias("v_qty"),
        F.round("l_extendedprice", 4).alias("v_price"),
    ).withColumn("variant", F.lit("inverse"))
    return a.unionByName(b)


def q_n2_n3_n4_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 minmax + N3 robust + N4 row-wise L2 + quantile binning
    (operators/binning, pd.qcut parity) as a tagged union — one driver
    row attests three scalers and the discretizer."""
    from dataforge_spark.operators.binning import bin_columns

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", *_NCOLS)
    mm, _ = normalize_data(li, columns=_NCOLS, method="minmax", feature_range=(0.0, 1.0))
    rb, _ = normalize_data(li, columns=_NCOLS, method="robust")
    l2, _ = normalize_data(li, columns=_NCOLS, method="normalize")
    def leg(df, tag):
        return df.select(
            "l_orderkey", "l_linenumber",
            F.round("l_quantity", 6).alias("v_qty"),
            F.round("l_extendedprice", 6).alias("v_price"),
        ).withColumn("variant", F.lit(tag))
    qb, _ = bin_columns(li, columns=_NCOLS, n_bins=4)
    qb_leg = qb.select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity_bin").cast("double").alias("v_qty"),
        F.col("l_extendedprice_bin").cast("double").alias("v_price"),
    ).withColumn("variant", F.lit("qbin4"))
    return (
        leg(mm, "minmax")
        .unionByName(leg(rb, "robust"))
        .unionByName(leg(l2, "l2"))
        .unionByName(qb_leg)
    )


def q_n6_scaling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    out = scaling_statistics_df(li, columns=_NCOLS)
    return out.select(
        "col_name",
        F.round("mean", 4).alias("mean"), F.round("std", 4).alias("std"),
        F.round("min", 4).alias("min"), F.round("max", 4).alias("max"),
        F.round("q25", 4).alias("q25"), F.round("q75", 4).alias("q75"),
        F.round("skew", 3).alias("skew"), F.round("kurt", 3).alias("kurt"),
    )


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clustering: two copy tiers (every 5th doc
    at +100000, every 10th ALSO at +200000) make the %10 docs 3-node
    components. MinHash@0.9 pairs (banding recall ≥ 1−4e-8 at this
    threshold, deterministic hashes) feed distributed connected
    components (dedup/components.py — min-label propagation with pointer
    jumping); the oracle recomputes the pair graph with exact Jaccard and
    resolves components with a recursive CTE. Output: (id, component) for
    every doc appearing in at least one pair."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    d2 = (
        docs.unionByName(
            docs.where(F.col("doc_id") % 5 == 0).select(
                (F.col("doc_id") + 100000).alias("doc_id"), "text"
            )
        ).unionByName(
            docs.where(F.col("doc_id") % 10 == 0).select(
                (F.col("doc_id") + 200000).alias("doc_id"), "text"
            )
        )
    )
    pairs = minhash_dedup_pairs(d2, text_col="text", id_col="doc_id",
                                n=3, num_perm=64, bands=16, threshold=0.9)
    return connected_components(pairs, "id_a", "id_b")


def q_dedup_exact_intercorpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union of the two digest-keyed exact-dedup shapes (slot
    freed round 5 for span dedup): WITHIN-corpus keep-first
    (dedup/exact.py) on the duplicated-docs frame, and INTER-corpus
    anti-join (dedup/intercorpus.py) of documents against a reference
    snapshot (every 5th doc). Only md5 digests shuffle in either leg."""
    from dataforge_spark.dedup.intercorpus import intercorpus_dedup

    a = dedup_exact(
        _docs_with_dups(spark, sf_dir), text_col="text", id_col="doc_id"
    ).select(F.lit("exact").alias("variant"), "doc_id", "text")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ref = docs.where(F.col("doc_id") % 5 == 0).select(F.col("text").alias("rtext"))
    b = intercorpus_dedup(docs, ref, text_col="text", ref_text_col="rtext").select(
        F.lit("intercorpus").alias("variant"), "doc_id", "text"
    )
    return a.unionByName(b)


def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style span-level exact dedup (dedup/spans.py): every
    repeated 5-word span across the corpus removed except its first
    (doc_id, span_idx) occurrence, documents rebuilt from surviving
    spans. ~6% of this corpus's spans are global repeats, so the row is
    a real removal, not a pass-through."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = span_dedup(docs, text_col="text", id_col="doc_id", span_words=5)
    return out.select("doc_id", "text", "n_spans_kept")


def q_dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return jaccard_pairs(docs, text_col="text", id_col="doc_id", n=3,
                         threshold=0.05, max_df=None)


def q_dedup_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH at threshold 0.9: the banding collision probability for
    j ≥ 0.9 is 1 − (1−j⁴)¹⁶ ≥ 1 − 4e-8 and the hashes are deterministic,
    so candidate recall is exactly complete on this corpus — the output
    must EQUAL the exact-Jaccard ≥ 0.9 pair set (SQL oracle)."""
    docs = _t(spark, sf_dir, "documents")
    return minhash_dedup_pairs(docs, text_col="text", id_col="doc_id",
                               n=3, num_perm=64, bands=16, threshold=0.9)


def q_dedup_simhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash with an IN-QUERY exactness proof: the Manku banded
    candidate join (any pair within hamming d agrees on ≥1 of d+1
    signature chunks) is an EXACT guarantee, so the banded pair set must
    equal a brute-force ``bit_count(xor)`` sweep over all signature pairs
    — n_disagree must be 0, and the 100 planted exact-duplicate pairs
    must all surface at hamming 0. The pair counts are deterministic
    (xxhash64 signatures over fixed testdata) and the oracle recomputes
    them at check time via a Spark-free pure-Python xxh64 + numpy hamming
    sweep (``tools/oracle_recompute.py``) — no pinned literals; the
    brute-force comparison inside the query is the actual guarantee (the
    O(n²) sweep is the verification harness, not the production path)."""
    from dataforge_spark.dedup.simhash import (
        hamming,
        pairs_from_signatures,
        simhash,
    )

    docs = _docs_with_dups(spark, sf_dir)
    # r13: signatures computed ONCE (guide §1.2 count-the-jobs). The old
    # shape ran FOUR separate .count() actions — n_disagree, n_banded,
    # n_brute, n_planted — each re-executing the token-explode + 64-vote
    # signature aggregate for every sigs reference in its lineage
    # (~10 signature computations per invocation, 25 jobs), then shipped
    # the counts through a driver createDataFrame. Now: one eager
    # localCheckpoint of the tiny (id, simhash) frame (|docs| × 16 B;
    # lineage-only, recomputed from parquet on every invocation), the
    # banded and brute pair sets both derive from it, and all four
    # counts come out of ONE aggregate over the full-outer-joined pair
    # sets — the O(n²) verification sweep runs once instead of thrice,
    # and the whole row is a single Spark plan (2 jobs: checkpoint +
    # aggregate) instead of a driver round-trip.
    sigs = simhash(docs, text_col="text", id_col="doc_id").localCheckpoint(
        eager=False
    )
    banded = pairs_from_signatures(sigs, max_hamming=3)
    a = sigs.select(F.col("id").alias("id_a"), F.col("simhash").alias("sa"))
    b = sigs.select(F.col("id").alias("id_b"), F.col("simhash").alias("sb"))
    brute = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .where(hamming(F.col("sa"), F.col("sb")) <= 3)
        .select("id_a", "id_b")
    )
    both = banded.select("id_a", "id_b", "hamming").withColumn(
        "_x", F.lit(1)
    ).join(brute.withColumn("_y", F.lit(1)), ["id_a", "id_b"], "full")
    return both.agg(
        F.count("_x").alias("n_pairs"),
        F.count("_y").alias("n_brute"),
        F.count(
            F.when(F.col("_x").isNull() | F.col("_y").isNull(), F.lit(1))
        ).alias("n_disagree"),
        F.count(
            F.when(
                (F.col("id_b") - F.col("id_a") == 100000)
                & (F.col("hamming") == 0),
                F.lit(1),
            )
        ).alias("n_planted"),
    )


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embedding-dedup family as ONE tagged union over
    ``(id_a, id_b, cos_sim, variant)`` — r12 folds the hyperplane-LSH
    top-k row and the new SemDeDup legs in to keep the registry at the
    driver's 50-row window (same consolidation move as r4/r5/r9):

    - ``exact``: exact small-corpus pair sweep, threshold 0.45 over the
      raw embeddings;
    - ``lsh``: hyperplane-LSH near-dup pairs over planted perturbed
      copies (threshold 0.98, all 50 planted pairs recovered);
    - ``lsh_topk``: planted-NN recovery for multi-table LSH top-k (the
      former sim_lsh_topk registry row — queries are the 50 perturbed
      copies, cos ≈ 0.9935 to their original, ≤ ~0.52 to all else, so
      filtering the top-k at cos ≥ 0.9 leaves exactly the
      (query, original) pairs — closed-form in SQL with the same
      perturbation formula);
    - SemDeDup legs (dedup/semantic.py, oracle-promoted — VERDICT r11
      task 2), survivors as ``id_a`` with NULL ``id_b``/``cos_sim``.
      Corpus = embeddings ∪ planted perturbed copies: the near-dup
      graph at threshold 0.9 is EXACTLY 50 disjoint 2-cliques
      (measured: planted cos 0.99347, max background cos 0.5128), so
      the greedy leader survivor set has a closed form DuckDB can
      recompute — a row survives iff no earlier-in-walk-order row is
      within threshold. Chain behavior (where greedy ≠ the closed
      form) stays pinned by tests/test_semantic_dedup.py's brute-force
      greedy twin.

      - ``sem_min_id``: k=1 (single cluster — assignment trivial, no
        k-means replica needed in SQL), keep-first walk: survivors =
        rows with no smaller-id neighbor ≥ 0.9.
      - ``sem_far_centroid``: k=1, the SemDeDup paper's keep rule. The
        k=1 centroid is closed-form (normalize(mean(normalized
        vectors)) — Lloyd's fixed point after one iteration), so the
        oracle recomputes cos-to-centroid per row and keeps each
        clique's least-prototypical member.
      - ``sem_k4``: k=4 content-keyed fitted centroids (the REAL
        clustered path: broadcast centroids, Arrow assignment,
        per-cluster greedy). Because every near-dup pair co-clusters
        (members differ by the 0.02-perturbation ≪ inter-cluster
        distance), the survivor set equals the ``sem_min_id`` closed
        form.
      - ``sem_k4_split_pairs``: the guard that makes the previous
        leg's assumption self-verifying INSIDE the row — the count of
        planted pairs whose members landed in different k=4 clusters,
        pinned to 0 by the oracle. If a regenerated corpus ever splits
        a pair, this leg fails loudly and diagnosably instead of the
        ``sem_k4`` leg hash-mismatching mysteriously.
    """
    from dataforge_spark.dedup.semantic import semantic_dedup
    from dataforge_spark.similarity.ivf import fit_centroids, with_ivf_bucket

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # r14 (guide §1.2, VERDICT task 4): the union corpus feeds SEVEN
    # consumers — the lsh pair leg, three semantic_dedup calls (each
    # referencing it up to 3× internally: bucketing, the survivor
    # semi-join, the unkeyed branch), the k=4 centroid fit, the bucket
    # assignment for the split-pair guard, and their construction-time
    # jobs (2 k=1 fits, 1 k=4 fit, the n_split count). Materialize it
    # once per invocation: scan + perturbation projection run one time
    # instead of once per reference. Lineage cut only — recomputed from
    # parquet next invocation, never a cross-run cache.
    u = emb.unionByName(_perturbed_embeddings(emb)).localCheckpoint(
        eager=False
    )

    exact = cosine_neardup_pairs(
        emb, id_col="vec_id", vec_col="embedding", threshold=0.45
    ).withColumn("variant", F.lit("exact"))
    lsh = lsh_neardup_pairs(
        u, id_col="vec_id", vec_col="embedding", threshold=0.98,
    ).withColumn("variant", F.lit("lsh"))
    topk = (
        lsh_cosine_topk(
            corpus=emb, queries=_perturbed_embeddings(emb), k=5,
            id_col="vec_id", vec_col="embedding",
            num_planes=12, num_tables=8,
        )
        .where(F.col("cos_sim") >= 0.9)
        .select(
            F.col("query_id").alias("id_a"),
            F.col("neighbor_id").alias("id_b"),
            "cos_sim",
            F.lit("lsh_topk").alias("variant"),
        )
    )

    def _sem_leg(df: DataFrame, variant: str) -> DataFrame:
        return df.select(
            F.col("vec_id").alias("id_a"),
            F.lit(None).cast("bigint").alias("id_b"),
            F.lit(None).cast("double").alias("cos_sim"),
            F.lit(variant).alias("variant"),
        )

    legs = [exact, lsh, topk]
    # r14: the two k=1 legs fitted IDENTICAL centroids (same input,
    # k, sample_rows, iters, seed) twice — one sample/fit job each.
    # Fit once, pass it to both (the documented `centroids` hook).
    C1 = fit_centroids(
        u.where(F.col("vec_id").isNotNull()), "embedding", k=1, seed=42
    )
    for variant, keep in (
        ("sem_min_id", "min_id"),
        ("sem_far_centroid", "far_from_centroid"),
    ):
        s = semantic_dedup(
            u, id_col="vec_id", vec_col="embedding",
            threshold=0.9, k=1, keep=keep, centroids=C1,
        )
        legs.append(_sem_leg(s, variant))

    C4 = fit_centroids(u, "embedding", k=4, seed=42)
    s4 = semantic_dedup(
        u, id_col="vec_id", vec_col="embedding",
        threshold=0.9, k=4, centroids=C4,
    )
    legs.append(_sem_leg(s4, "sem_k4"))

    b = with_ivf_bucket(u, C4, "embedding", "_b").select("vec_id", "_b")
    orig = b.where(F.col("vec_id") < 100000).select(
        "vec_id", F.col("_b").alias("_b_orig")
    )
    copy = b.where(F.col("vec_id") >= 100000).select(
        (F.col("vec_id") - 100000).alias("vec_id"),
        F.col("_b").alias("_b_copy"),
    )
    # r14: the split-pair count used to be an eager .count() action +
    # driver createDataFrame round-trip (guide §5.1: keep the driver out
    # of the data path) — now it is an aggregate leg INSIDE the one
    # union plan; same single-row result, one construction job fewer.
    n_split_leg = (
        orig.join(copy, "vec_id")
        .where(F.col("_b_orig") != F.col("_b_copy"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("vec_id"))
    )
    legs.append(_sem_leg(n_split_leg, "sem_k4_split_pairs"))

    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out




def q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k. Registry slot merged into
    q_sim_pq_topk's ``exact`` leg in round 9 (VERDICT r8 task 3); kept
    as a standalone function for the bench row's continuity."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.where(F.col("vec_id") < 10)
    return cosine_topk(corpus=emb, queries=q, k=5, id_col="vec_id", vec_col="embedding")


def q_sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized-ANN family (similarity/pq.py, similarity/sq.py) with
    exact re-rank, oracle-matched against DuckDB brute-force cosine, as
    one tagged union with the exact brute-force row it must reproduce:

    - ``exact``: brute_force.cosine_topk (the former sim_cosine_topk
      registry row, folded in to free the slot — VERDICT r8 task 3);
    - ``pq``: 8-subspace one-byte codes (32× compression at 64-dim
      f32), ADC candidate generation over CODES only, exact-cosine
      re-rank of the refine·k pool. The re-rank emits EXACT similarities
      and at refine=24 the candidate pool EMPIRICALLY covers the true
      top-5 on this corpus (measured recall 1.0 — bench recall block),
      so the leg is held to the SAME brute-force oracle: a hash match
      proves the full encode→ADC→re-rank path returns the exact answer,
      not an approximation. This coverage is a measured property of the
      current corpus distribution, not a guarantee — if a regenerated
      corpus ever fails this row with correct-looking similarities,
      diagnose it as a recall shortfall at refine=24 (check the bench
      ``pq@5.r24`` recall entry, which isolates recall from correctness)
      before suspecting the PQ implementation. The genuinely approximate
      low-refine settings stay pinned by the recall pytests/bench block,
      like small-nprobe IVF.
    - ``sq`` (r13): scalar quantization — one byte PER DIMENSION (4× vs
      f32 where PQ is 32×, with far lower distortion), aggregate-exact
      per-dim min/max fit (no sampling — the index is a pure function
      of corpus content), persisted codes + params sidecar
      (build_sq_index), dequantize-and-matmul candidate scan, exact
      re-rank at the same refine=24, held to the same brute-force
      oracle with the same recall-vs-correctness diagnosis contract.

    Fit/encode are index-build work, not per-query work (the same
    amortization as the IVF rows): the codes + codebooks are persisted
    ONCE per corpus fingerprint via ``write_pq_index`` and every search
    reads them back — at 100 TB the query scans the stored 32×-compressed
    codes, it does not re-quantize the corpus. The paired codebooks ride
    in the same index dir so codes are never scored under a foreign
    codebook. Exactness here is codebook-robust by the refine=24
    coverage, and the sidecar pairing plus the path+mtime+size
    fingerprint keep the cache coherent across corpus regenerations."""
    from dataforge_spark.similarity.pq import pq_cosine_topk, read_pq_codebooks

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.where(F.col("vec_id") < 10)
    exact = cosine_topk(
        corpus=emb, queries=q, k=5, id_col="vec_id", vec_col="embedding"
    ).withColumn("variant", F.lit("exact"))
    path, _ = build_pq_index(spark, sf_dir)
    books = read_pq_codebooks(spark, path)
    codes = spark.read.parquet(f"{path}/codes").select(
        F.col("neighbor_id").alias("vec_id"), "_pq_code"
    )
    pq = pq_cosine_topk(
        emb, q, k=5, id_col="vec_id", vec_col="embedding",
        m=8, ks=256, refine=24, codebooks=books, encoded=codes,
    ).withColumn("variant", F.lit("pq"))
    # r13: SQ8 leg (similarity/sq.py) — one byte PER DIMENSION (4× vs
    # f32; PQ is 32×), near-exact candidate ordering, same persisted-
    # index + exact-re-rank contract, held to the same oracle. The
    # aggregate-exact fit means the index is content-deterministic with
    # no sampling caveat at all.
    from dataforge_spark.similarity.sq import read_sq_params, sq_cosine_topk

    sq_path, _ = build_sq_index(spark, sf_dir)
    sq_params = read_sq_params(spark, sq_path)
    sq_codes = spark.read.parquet(f"{sq_path}/codes")
    sq = sq_cosine_topk(
        emb, q, k=5, id_col="vec_id", vec_col="embedding",
        refine=24, params=sq_params, encoded=sq_codes,
    ).withColumn("variant", F.lit("sq"))
    return exact.unionByName(pq).unionByName(sq)


def q_sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-NN recovery for hyperplane LSH top-k: queries are the 50
    perturbed copies (cos ≈ 0.9935 to their original, ≤ ~0.52 to all
    else), so each query's true nearest neighbor is its original vector.
    Multi-table LSH must surface that NN in the top-k via bucket
    collisions alone; filtering the top-k at cos ≥ 0.9 leaves exactly the
    (query, original) pairs — closed-form in SQL with the same
    perturbation formula."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = _perturbed_embeddings(emb)
    out = lsh_cosine_topk(corpus=emb, queries=q, k=5, id_col="vec_id",
                          vec_col="embedding", num_planes=12, num_tables=8)
    return out.where(F.col("cos_sim") >= 0.9)


_IVF_CENTROIDS: dict = {}


def _corpus_ident(sf_dir: str, table: str = "embeddings") -> str:
    import hashlib as _hashlib
    import os as _os

    src = _os.path.join(sf_dir, f"{table}.parquet")
    try:
        st = _os.stat(src)
        ident = f"{_os.path.realpath(src)}|{st.st_mtime_ns}|{st.st_size}"
    except OSError:
        # unfingerprintable input: key on (dir, pid) — reused within
        # this process, never across processes. CAVEAT (ADVICE r7): if a
        # corpus at this path is deleted and regenerated within one
        # process, this key still hits and serves the OLD centroids.
        # That is safe ONLY for exactness-independent callers (full
        # probe / on-disk rebuild check): centroids then affect cost,
        # never results. An approximate nprobe < n_centroids caller must
        # NOT rely on this cache for a mutated corpus — include a
        # content fingerprint (e.g. row count + a sample hash) in the
        # key before reusing it there.
        ident = f"{sf_dir}|{_os.getpid()}"
    return _hashlib.md5(ident.encode()).hexdigest()[:12]


def q_sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with full probe (nprobe = n_centroids) — must equal the exact
    brute-force top-k, so it shares that oracle; the approximate small-
    nprobe path is covered by the recall pytest.

    The coarse quantizer is fitted ONCE per corpus fingerprint and
    reused across queries (same amortization argument — and the same
    path+mtime+size identity — as the on-disk index row: an IVF
    centroid set is index state, not per-query work; re-fitting it per
    search both mis-states the steady-state cost and is something no
    ANN system does). Correctness is centroid-independent here:
    full-probe results are exact for ANY centroid set, which is what
    the shared brute-force oracle enforces; the small-nprobe recall
    pytests re-fit explicitly."""
    from dataforge_spark.similarity.ivf import fit_centroids, ivf_cosine_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    key = (_corpus_ident(sf_dir), 16)
    if key not in _IVF_CENTROIDS:
        _IVF_CENTROIDS[key] = fit_centroids(emb, "embedding", k=16)
    q = emb.where(F.col("vec_id") < 10)
    return ivf_cosine_topk(corpus=emb, queries=q, k=5, id_col="vec_id",
                           vec_col="embedding", n_centroids=16, nprobe=16,
                           centroids=_IVF_CENTROIDS[key])


def build_ivf_disk_index(spark: SparkSession, sf_dir: str) -> tuple[str, float]:
    """Build (or reuse) the on-disk IVF index for ``sf_dir``'s embeddings.

    The index path is keyed on the INPUT's identity (path + mtime + size,
    stable hash), so repeated calls against unchanged testdata reuse the
    index — an on-disk index is by design a once-per-corpus amortized
    cost, and conflating it with every search mis-states both numbers.
    Returns (path, build_seconds) with build_seconds == 0.0 on reuse.
    """
    import os as _os
    import time as _time

    from dataforge_spark.similarity.ivf import write_ivf_index

    path = f"/tmp/dataforge_ivf_idx_{_corpus_ident(sf_dir)}"
    if _os.path.exists(
        _os.path.join(path, "vectors", "_SUCCESS")
    ) and _os.path.exists(_os.path.join(path, "centroids", "_SUCCESS")):
        return path, 0.0
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    t0 = _time.time()
    write_ivf_index(emb, path, id_col="vec_id", vec_col="embedding", n_centroids=16)
    return path, round(_time.time() - t0, 3)


def build_zorder_layout(spark: SparkSession, sf_dir: str) -> tuple[str, float]:
    """Build (or reuse) the Z-ordered copy of ``sf_dir``'s documents —
    the same once-per-corpus amortization and path+mtime+size
    fingerprint as the IVF/PQ index builds (VERDICT r11 task 4: a
    once-per-corpus LAYOUT write inside a per-query timed row misprices
    both; bench reports it as ``zorder_write_sec``, the row times the
    read side). Returns (path, build_seconds), 0.0 on reuse."""
    import os as _os
    import time as _time

    from dataforge_spark.partitioning import zorder_write

    path = f"/tmp/dataforge_zorder_{_corpus_ident(sf_dir, 'documents')}"
    if _os.path.exists(_os.path.join(path, "_SUCCESS")):
        return path, 0.0
    docs = _t(spark, sf_dir, "documents")
    t0 = _time.time()
    zorder_write(
        docs.select("doc_id", "lang", "n_chars"), path,
        ["n_chars", "lang"], bits=6, target_files=4,
    )
    return path, round(_time.time() - t0, 3)


def build_pq_index(spark: SparkSession, sf_dir: str) -> tuple[str, float]:
    """Build (or reuse) the persisted PQ index (codes + codebook sidecar)
    for ``sf_dir``'s embeddings — the same once-per-corpus amortization
    and path+mtime+size fingerprint as ``build_ivf_disk_index``. Returns
    (path, build_seconds); 0.0 when an index for this fingerprint already
    exists."""
    import os as _os
    import time as _time

    from dataforge_spark.similarity.pq import write_pq_index

    path = f"/tmp/dataforge_pq_idx_{_corpus_ident(sf_dir)}"
    if _os.path.exists(
        _os.path.join(path, "codes", "_SUCCESS")
    ) and _os.path.exists(_os.path.join(path, "codebooks", "_SUCCESS")):
        return path, 0.0
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    t0 = _time.time()
    write_pq_index(emb, path, id_col="vec_id", vec_col="embedding", m=8, ks=256)
    return path, round(_time.time() - t0, 3)


def build_sq_index(spark: SparkSession, sf_dir: str) -> tuple[str, float]:
    """Build (or reuse) the persisted SQ8 index (byte codes + per-dim
    range params sidecar) for ``sf_dir``'s embeddings — same
    once-per-corpus amortization and fingerprint as ``build_pq_index``.
    The SQ fit is aggregate-exact (per-dim min/max), so the index is a
    pure function of corpus content."""
    import os as _os
    import time as _time

    from dataforge_spark.similarity.sq import write_sq_index

    path = f"/tmp/dataforge_sq_idx_{_corpus_ident(sf_dir)}"
    if _os.path.exists(
        _os.path.join(path, "codes", "_SUCCESS")
    ) and _os.path.exists(_os.path.join(path, "params", "_SUCCESS")):
        return path, 0.0
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    t0 = _time.time()
    write_sq_index(emb, path, id_col="vec_id", vec_col="embedding")
    return path, round(_time.time() - t0, 3)


def q_sim_ivf_disk_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-disk IVF index (similarity/ivf.py write/search): the index is
    materialized as bucket-partitioned parquet under /tmp (built once per
    corpus fingerprint via build_ivf_disk_index; bench reports the build
    cost separately), then searched with FULL probe (nprobe =
    n_centroids) — results must equal the exact brute-force top-k, so
    this shares that oracle. The probed-bucket filter lands on the
    partition column (PartitionFilters prune unprobed directories —
    pinned by pytest); at small nprobe a query reads ~nprobe/n_centroids
    of the data."""
    from dataforge_spark.similarity.ivf import search_ivf_index

    path, _ = build_ivf_disk_index(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.where(F.col("vec_id") < 10)
    return search_ivf_index(spark, path, q, k=5, nprobe=16,
                            id_col="vec_id", vec_col="embedding")


def q_stream_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two windowed streaming operators as one tagged union over
    (op, s, k, n, v) — round 10 widened the r5 sliding-window row with
    the stream-stream join class:

    - ``wagg``: keyed sliding-window aggregation
      (streaming.sliding_counts): 1 h windows sliding every 30 min per
      event_type — each event lands in two overlapping windows,
      maintained by the streaming state store behind a 2 h watermark;
      complete-mode memory sink (aggregate streams can't append until
      the watermark closes a window). s = window start, k = event_type,
      n = count, v = value sum.
    - ``sjoin`` (round 10): watermarked STREAM-STREAM interval join
      (streaming.interval_join_stream) — the attribution shape:
      'impressions' (event_id ≡ 0 mod 10) inner-joined to 'clicks'
      (≡ 5 mod 10) of the same user whose click time falls within
      [imp_ts, imp_ts + 30 min]; two independent file-source streams
      over the same input (a streaming self-join), pairs drained
      through the production parquet sink, then summarized per user:
      k = user_id, n = pair count, v = click-value sum. Both sides'
      join state is bounded by watermark + interval — the property
      that matters on unbounded input."""
    from dataforge_spark.streaming import (
        interval_join_stream,
        run_aggregate_to_memory,
        run_to_parquet_df,
        sliding_counts,
    )

    _utc(spark)
    ev = _events(spark, sf_dir)
    path = _stream_input_path(spark, sf_dir, "ev", lambda: ev)
    stream = read_events_stream(spark, path, ev.schema)
    agg = sliding_counts(stream, ts_col="ts", key_col="event_type",
                         window="1 hour", slide="30 minutes", watermark="2 hours")
    got = run_aggregate_to_memory(agg)
    wagg = got.select(
        F.lit("wagg").alias("op"),
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("s"),
        F.col("event_type").alias("k"),
        F.col("n_events").cast("bigint").alias("n"),
        F.round("sum_value", 4).alias("v"),
    )

    return wagg.unionByName(_stream_sjoin_leg(spark, sf_dir))


def _stream_sjoin_leg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sjoin leg of q_stream_window_agg (also benched standalone as
    ``stream_sjoin``). A stream-stream join maintains FOUR state stores
    per shuffle partition per side, and every micro-batch commits all
    of them — at this gate's scale (60k rows/side) that flat
    per-partition commit cost dominates (A/B at sf0.1: 32 → 8 → 4
    partitions = 7.2 → 2.7 → 2.1 s), so the leg sizes the state
    partitioning from the input's Catalyst plan bytes
    (streaming.suggest_state_partitions — round 11, replacing the
    pinned 8; captured/restored around the query start). At 100 TB the
    same knob goes the OTHER way: state-partition count should track
    state volume, exactly like the sessionizer's (more partitions =
    more parallel state work once data dominates) — which is what the
    plan-bytes-linear suggestion does."""
    from dataforge_spark.partitioning import plan_size_bytes
    from dataforge_spark.streaming import (
        interval_join_stream,
        run_to_parquet_df,
        suggest_state_partitions,
    )

    _utc(spark)
    ev = _events(spark, sf_dir)
    path = _stream_input_path(spark, sf_dir, "ev", lambda: ev)
    imp = read_events_stream(spark, path, ev.schema).where(
        F.col("event_id") % 10 == 0
    ).select(F.col("user_id").alias("i_user"), F.col("ts").alias("i_ts"))
    clk = read_events_stream(spark, path, ev.schema).where(
        F.col("event_id") % 10 == 5
    ).select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"), "value")
    pairs = interval_join_stream(
        imp, clk, "i_user", "c_user", "i_ts", "c_ts",
        upper="30 minutes", watermark="2 hours",
    )
    # capture WITHOUT a default and restore unconditionally — conf.get
    # with a default returns the default, not the session value, and a
    # guarded restore leaks the override into the shared session
    cur = spark.conf.get("spark.sql.shuffle.partitions")
    n_parts = suggest_state_partitions(spark, plan_size_bytes(ev))
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        joined = run_to_parquet_df(pairs)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", cur)
    return joined.groupBy("i_user").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("v"),
    ).select(
        F.lit("sjoin").alias("op"), F.lit("").alias("s"),
        F.col("i_user").cast("string").alias("k"), "n", "v",
    )


def q_stream_sjoin_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only: the stream-stream join leg alone — benched as its own
    row (`stream_sjoin`) so the r1-r9 `stream_window_agg` bench history
    stays 1:1 comparable (that name keeps timing only the wagg leg)."""
    return _stream_sjoin_leg(spark, sf_dir)


def q_stream_wagg_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only: the sliding-window aggregation leg alone — the
    pre-r10 meaning of the `stream_window_agg` bench row."""
    from dataforge_spark.streaming import run_aggregate_to_memory, sliding_counts

    _utc(spark)
    ev = _events(spark, sf_dir)
    path = _stream_input_path(spark, sf_dir, "ev", lambda: ev)
    stream = read_events_stream(spark, path, ev.schema)
    agg = sliding_counts(stream, ts_col="ts", key_col="event_type",
                         window="1 hour", slide="30 minutes", watermark="2 hours")
    return run_aggregate_to_memory(agg)


def q_o4_isolation_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 isolation forest (remove action): numpy reimplementation of
    Liu '08 (sklearn absent in sandbox), seeded RNG + sorted fit values →
    the flagged set is a pure function of the value multiset, so the
    kept-row count and kept-id checksum are deterministic and pinned
    closed-form in the oracle (same pattern as dedup_simhash_verified)."""
    ev = _events(spark, sf_dir).select("event_id", "value")
    kept = handle_outliers(
        ev, columns=["value"], method="isolation_forest", action="remove"
    )
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("event_id").alias("kept_id_sum"),
    )


_TXT_CLF: dict = {}

# Classifier hyperparameters — MUST stay equal to the twin's constants
# in tools/oracle_recompute.py (CLF_DIM/..): the oracle recomputes
# training sequentially with these exact values.
_CLF_DIM = 1 << 15
_CLF_NGRAM = 2
_CLF_EPOCHS = 8
_CLF_POS_RULE = r"\bspark\b"


def _get_txt_classifier(spark: SparkSession, sf_dir: str):
    """Train (once per corpus fingerprint) the hashed-n-gram quality
    classifier q_txt_metrics scores with — the same once-per-corpus
    amortization the IVF/PQ index builds use: training is index-build
    work, scoring is the per-query work. Classes: documents containing
    the standalone token "spark" (trusted) vs the rest — a
    text-derived, engine-replicable split with per-doc non-trivial
    margins (measured min |margin| 0.0275 at sf0.01).

    Round 13 (VERDICT r12 task 7): the trained weights also persist to
    disk keyed on the corpus fingerprint + hyperparameters, so a fresh
    process (each bench/gate run is one) loads ~256 KB of weights
    instead of re-fitting — training is deterministic by construction
    (full-batch Adagrad, hash-capped sampling), the oracle twin replays
    it sequentially either way, and a corpus change changes the
    fingerprint, never serving stale weights."""
    import numpy as _np

    from dataforge_spark.functions.quality_classifier import (
        HashedTextClassifier,
        train_quality_classifier,
    )

    key = _corpus_ident(sf_dir, "documents")
    model = _TXT_CLF.get(key)
    if model is not None:
        return model
    cache = (
        f"/tmp/dataforge_txt_clf_{key}_{_CLF_DIM}_{_CLF_NGRAM}_"
        f"{_CLF_EPOCHS}.npz"
    )
    if os.path.exists(cache):
        z = _np.load(cache)
        model = HashedTextClassifier(
            z["weights"], float(z["bias"]), ngram=int(z["ngram"])
        )
    else:
        docs = (
            _t(spark, sf_dir, "documents")
            .select("text")
            .where(F.col("text").isNotNull())
        )
        is_pos = F.lower(F.col("text")).rlike(_CLF_POS_RULE)
        model = train_quality_classifier(
            docs.where(is_pos),
            docs.where(~is_pos),
            dim=_CLF_DIM,
            ngram=_CLF_NGRAM,
            epochs=_CLF_EPOCHS,
            max_docs_per_class=1000,
        )
        tmp = f"{cache}.{os.getpid()}.tmp.npz"
        _np.savez(
            tmp, weights=model.weights, bias=model.bias, ngram=model.ngram
        )
        os.replace(tmp, cache)  # atomic: concurrent runs see whole files
    _TXT_CLF[key] = model
    return model


_DSIR_MODELS: dict = {}
_DSIR_BUCKETS = 10_000


def _dsir_model(spark: SparkSession, sf_dir: str):
    """Fit (or reuse) the DSIR importance model for ``sf_dir``'s
    documents — target = lang='en' docs, raw = all docs — plus the
    resample size k = ceil(n/10). Same once-per-corpus-fingerprint
    amortization as the IVF/PQ/z-order/classifier builds: the fitted
    table is 10k int64 micro-nats (~80 KB npz) and fit is deterministic
    (integer counts + scalar libm logs), so a disk cache serves any
    later process bit-identically."""
    import math as _math

    import numpy as _np

    from dataforge_spark.functions.dsir import DsirModel, fit_dsir

    key = _corpus_ident(sf_dir, "documents")
    hit = _DSIR_MODELS.get(key)
    if hit is not None:
        return hit
    cache = f"/tmp/dataforge_dsir_{key}_{_DSIR_BUCKETS}.npz"
    docs = _t(spark, sf_dir, "documents")
    if os.path.exists(cache):
        z = _np.load(cache)
        model = DsirModel(
            n_buckets=int(z["n_buckets"]), seed=int(z["seed"]),
            alpha=float(z["alpha"]), ratio_micro=z["ratio_micro"],
            n_target_grams=int(z["nt"]), n_raw_grams=int(z["nr"]),
        )
        k = int(z["k"])
    else:
        model = fit_dsir(
            docs.where(F.col("lang") == "en"), docs,
            n_buckets=_DSIR_BUCKETS, seed=0,
        )
        k = _math.ceil(docs.count() / 10)
        tmp = f"{cache}.{os.getpid()}.tmp.npz"
        _np.savez(
            tmp, n_buckets=model.n_buckets, seed=model.seed,
            alpha=model.alpha, ratio_micro=model.ratio_micro,
            nt=model.n_target_grams, nr=model.n_raw_grams, k=k,
        )
        os.replace(tmp, cache)
    _DSIR_MODELS[key] = (model, k)
    return model, k


def q_txt_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text-metric suite, r7 fused formulation
    (VERDICT r6 task 4): ONE Arrow pass (doc_metrics_struct) computes
    the stopword vector, rolling fingerprint, Gopher repetition
    fractions, and the per-doc token-count map; the JVM legs (counts,
    md5, Han regex, language CASE) ride the same projection. The
    projection is checkpointed WITHOUT raw text so the unigram-LM leg's
    two consumers (vocab fit, scoring) re-read small columns + the tc
    map instead of re-running the UDF or re-exploding corpus token
    instances. Replaces: 3 corpus scans, 2 Python passes, 2
    corpus-sized explodes, 2 groupBy shuffles and a doc_id restore join
    of the unfused form (sf1: 7.3 s → ~3.4 s).

    Round 12 (VERDICT r11 task 3) adds the crawl-quality gate verdicts
    per doc, all riding the SAME projection:

    - Gopher (functions/gopher.py): the seven-rule stats + overall
      ``gopher_keep``, computed on the raw text — word_count and
      req_stopword_hits vary per doc, the symbol/bullet/ellipsis
      fractions pin the zero on this corpus.
    - C4 (functions/c4.py): applied to a constructed page (text +
      deterministic per-``doc_id % {3,5,7}`` planted lines, same
      closed form in the DuckDB oracle) so line cleaning, sentence
      counting, the javascript rule, AND the raw-text brace block
      (the r11 ADVICE fix) all produce per-doc varying verdicts.
    - Classifier (functions/quality_classifier.py): ``clf_prob`` /
      ``clf_keep`` from the corpus-fingerprint-cached model
      (_get_txt_classifier); the oracle recomputes training itself
      with a sequential numpy twin (tools/oracle_recompute.py
      classifier_expected) — probs rounded to 3 decimals, verdicts at
      0.5 with measured min |margin| 0.0275, so float-addition-order
      differences (~1e-12) cannot flip a cell.
    """
    from dataforge_spark.functions.c4 import c4_page_struct
    from dataforge_spark.functions.gopher import gopher_quality_struct
    from dataforge_spark.functions.quality_classifier import quality_prob
    from dataforge_spark.functions.text_analysis import (
        doc_metrics_struct,
        unigram_logprob_from_counts,
    )

    from dataforge_spark.partitioning import ensure_parallelism

    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    m = doc_metrics_struct(t, n=2)
    g = gopher_quality_struct(t)
    page = F.concat_ws(
        "\n",
        F.lit("A solid first sentence with enough words to pass easily."),
        t,
        F.when(F.col("doc_id") % 3 == 0, F.lit("Too short."))
        .otherwise(F.lit("Another full sentence with plenty of words to count.")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit("This sentence mentions javascript cookies and other words."),
        ).otherwise(F.lit("A third proper sentence closes the page neatly today.")),
        F.when(F.col("doc_id") % 7 == 0, F.lit("if (x) { return y; }"))
        .otherwise(
            F.lit("A fourth sentence provides extra insurance for counting.")
        ),
    )
    c4 = c4_page_struct(page)
    clf = quality_prob("text", _get_txt_classifier(spark, sf_dir))
    # the per-doc metric projection is CPU-bound; a single-row-group
    # documents file would otherwise run it on one core.
    #
    # The pure-Catalyst structs (gopher, c4) are materialized in their
    # OWN projection and field-extracted in the next: extracting n
    # fields straight off the struct expression makes
    # SimplifyExtractValueOps clone the struct's subtree once per field
    # (measured +50% on the gopher leg at sf0.1), while CollapseProject
    # declines to merge the two projections precisely because that
    # would duplicate the non-cheap struct. The Arrow struct (m) is
    # immune — one ArrowEvalPython node either way.
    pre = ensure_parallelism(docs).select(
        "doc_id", "text", g.alias("_g"), c4.alias("_c4")
    )
    g = F.col("_g")
    c4 = F.col("_c4")
    full = (
        pre
        .select(
            "doc_id",
            token_count(t).alias("n_tokens"),
            regex_token_count(t).alias("n_regex_tokens"),
            language_id(t, hits=m["swc"]).alias("lang_guess"),
            F.round(quality_score(t, hits=m["swc"]), 6).alias("quality"),
            fingerprint(t).alias("fp"),
            m["rfp"].alias("rfp"),
            F.round(m["rep_top_frac"], 6).alias("rep_top_frac"),
            F.round(m["rep_dup_frac"], 6).alias("rep_dup_frac"),
            g["word_count"].alias("g_word_count"),
            g["mean_word_len"].alias("g_mean_word_len"),
            g["symbol_word_ratio"].alias("g_symbol_word_ratio"),
            g["bullet_line_frac"].alias("g_bullet_line_frac"),
            g["ellipsis_line_frac"].alias("g_ellipsis_line_frac"),
            g["alpha_word_frac"].alias("g_alpha_word_frac"),
            g["req_stopword_hits"].alias("g_stopword_hits"),
            g["keep"].alias("gopher_keep"),
            c4["n_lines_in"].alias("c4_lines_in"),
            c4["n_lines_kept"].alias("c4_lines_kept"),
            c4["n_sentences"].alias("c4_sentences"),
            c4["keep"].alias("c4_keep"),
            F.round(clf, 3).alias("clf_prob"),
            (clf >= 0.5).alias("clf_keep"),
            m["tc"].alias("tc"),
        )
        .localCheckpoint(eager=False)
    )
    # CCNet-style unigram LM signal: corpus-fitted, Laplace-1;
    # min_count=1 → the corpus IS the vocabulary, no OOV branch.
    entries = full.select(
        "doc_id", F.explode_outer("tc").alias("w", "cnt")
    )
    lm = unigram_logprob_from_counts(entries, id_col="doc_id").select(
        F.col("id").alias("doc_id"),
        F.round("avg_logprob", 6).alias("avg_logprob"),
    )
    return full.drop("tc").join(lm, "doc_id")


def q_llm_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data prep over documents as one tagged union
    (round 11 widened to driver-oracle the previously pytest-only
    curation components — VERDICT r10 task 5). Legs share
    ``(op, k, n_docs, total_tokens, avg_quality, x)``:

    - ``prep``: quality gate → language gate → exact dedup (near-dups
      planted) → per-source token accounting, k = source — the original
      composition the extension surface exists for;
    - ``chunk``: `curation.chunk_documents(max_tokens=32, overlap=8)`
      grouped by chunk_id — the oracle recomputes every chunk boundary
      closed-form (token-array slices), avg_quality carries the mean
      chunk TEXT length (pins the reassembled strings, not just
      counts), x the mean chunk token count;
    - ``qf``: `curation.quality_filter` verdicts grouped by the keep
      flag — avg_quality pins the quality signal, x the two Gopher
      repetition fractions (rep_top + rep_dup means), total_tokens the
      whitespace token mass per verdict;
    - ``sample``: `curation.sample_n_per_group(10 per source, key
      doc_id)` — n_docs pins the exact per-group count, total_tokens =
      sum(doc_id) pins the exact MEMBERSHIP (the md5-bucket ranking is
      engine-reproducible, like curation_split's oracle).
    """
    from dataforge_spark.curation import (
        chunk_documents,
        quality_filter,
        sample_n_per_group,
    )

    docs_raw = _t(spark, sf_dir, "documents")
    docs = _docs_with_dups(spark, sf_dir).join(
        docs_raw.select("doc_id", "source"), "doc_id", "left"
    )
    # planted dups carry doc_id+100000 → source null; treat as 'dup'
    docs = docs.withColumn("source", F.coalesce("source", F.lit("dup")))
    t = F.col("text")
    scored = docs.select(
        "doc_id", "source", "text",
        F.round(quality_score(t), 6).alias("q"),
        language_id(t).alias("lang"),
        token_count(t).alias("n_tok"),
    )
    kept = scored.where((F.col("q") >= 0.5) & (F.col("lang") == "en"))
    deduped = dedup_exact(kept, text_col="text", id_col="doc_id")
    prep_leg = deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.round(F.avg("q"), 6).alias("avg_quality"),
    ).select(
        F.lit("prep").alias("op"), F.col("source").alias("k"),
        "n_docs", "total_tokens", "avg_quality", F.lit(0.0).alias("x"),
    )

    chunk_leg = chunk_documents(
        docs_raw.select("doc_id", "text"), max_tokens=32, overlap=8
    ).groupBy("chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("chunk_n_tokens").cast("bigint").alias("total_tokens"),
        F.round(F.avg(F.length("chunk_text")), 6).alias("avg_quality"),
        F.round(F.avg("chunk_n_tokens"), 6).alias("x"),
    ).select(
        F.lit("chunk").alias("op"),
        F.col("chunk_id").cast("string").alias("k"),
        "n_docs", "total_tokens", "avg_quality", "x",
    )

    qf_leg = quality_filter(docs_raw.select("doc_id", "text")).select(
        "keep", "quality", "rep_top_frac", "rep_dup_frac",
        token_count(F.col("text")).alias("n_tok"),
    ).groupBy("keep").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
        F.round(
            F.avg("rep_top_frac") + F.avg("rep_dup_frac"), 6
        ).alias("x"),
    ).select(
        F.lit("qf").alias("op"), F.col("keep").cast("string").alias("k"),
        "n_docs", "total_tokens", "avg_quality", "x",
    )

    sample_leg = sample_n_per_group(
        docs_raw.select("doc_id", "source"), 10, "source", ["doc_id"], seed=0
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("total_tokens"),
    ).select(
        F.lit("sample").alias("op"), F.col("source").alias("k"),
        "n_docs", "total_tokens",
        F.lit(0.0).alias("avg_quality"), F.lit(0.0).alias("x"),
    )

    return (
        prep_leg.unionByName(chunk_leg)
        .unionByName(qf_leg).unionByName(sample_leg)
    )


def q_mm_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three multimodal-binary operators as one tagged union over a
    shared (op, doc_id, k, n, s) schema:

    - ``meta``:  binary metadata — k=0, n=n_bytes, s=8-byte prefix;
    - ``feat``:  byte-histogram fake-decode features, DE-normalized to
      integer bucket counts (feature × n_bytes, rounded) so the float32
      array is SQL-comparable EXACTLY (the corpus is pure ASCII: DuckDB
      recomputes the same histogram from characters) — k=bucket, n=count;
    - ``frame``: every-4th 16-byte frame sample — k=frame_idx, n=0,
      s=frame hex;
    - ``media`` (round 8; PNG round 9; all PNG variants + GIF round
      10): REAL container decode — each doc_id gets a genuine encoded
      payload by ``doc_id mod 8``:
        0: 8×4 24-bit BMP, pixel bytes ``(doc_id + j) % 256``;
        1: mono 16-bit 8 kHz WAV, samples ``((doc_id*7 + j*13) % 65536)
           - 32768``;
        2: 6×4 RGBA PNG, pixel bytes ``(doc_id + j) % 256``;
        3: 8×3 grayscale PNG, same byte formula over 24 scalars;
        4: 5×4 gray+alpha PNG, same formula over 40 scalars;
        5: 5×5 palette PNG (PLTE 4 entries + tRNS[10,20], packed at
           depth 2 — sub-byte scanlines, round 11) with indices
           ``(doc_id + j) % 4`` — decodes through the lookup to RGBA,
           so k is a CASE-sum over the per-index scalar totals
           (265/275/510/279);
        6: 4×4 16-bit grayscale Adam7-INTERLACED PNG, samples
           ``(doc_id*3 + j*257) % 65536`` — exercises the round-10
           deep-pixel + interlace decode in the oracle row;
        7: THREE-frame 4×4 GIF (LZW, lossless), frame ``f`` indices
           ``(doc_id + f*16 + j) % 4`` over the fixed 4-color palette —
           k sums all frames (CASE over per-index RGB totals
           255/255/255/24), n = 3·4·4·3.
      All decoded by the pure-stdlib codecs (`dataforge_spark.codecs`);
      k = exact integer sum of the DECODED scalars (header/padding/
      compression excluded — only a real decode produces it), n =
      decoded scalar count, s = kind:WxH@rate. DuckDB recomputes every
      construction arithmetically via generate_series, so the oracle
      covers encoder AND decoder (for PNG: the zlib round-trip, CRC,
      filter, palette-lookup and Adam7 de-interlace paths too);
    - ``resize`` (round 10): every IMAGE variant additionally runs
      decode → 4×4 NEAREST resize (`multimodal.resize_images`) →
      lossless PNG re-encode → second decode, with k = the resized
      pixel sum. Nearest index maps are exact integer functions
      (src = floor((out+0.5)·src_dim/4)), so DuckDB recomputes the full
      four-stage chain closed-form — the resize operator is
      driver-oracle-backed, not just pytest-pinned."""
    from dataforge_spark.multimodal import media_meta, sample_frames

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    binary = attach_binary(docs)

    meta = binary_meta(binary, bin_col="payload", prefix_len=8).select(
        F.lit("meta").alias("op"), "doc_id",
        F.lit(0).cast("bigint").alias("k"),
        F.col("n_bytes").cast("bigint").alias("n"),
        F.col("prefix").alias("s"),
    )
    feat = extract_features(binary, bin_col="payload", id_col="doc_id").select(
        F.col("id").alias("doc_id"), "n_bytes",
        F.posexplode("features").alias("idx", "f"),
    ).select(
        F.lit("feat").alias("op"), "doc_id",
        F.col("idx").cast("bigint").alias("k"),
        F.round(F.col("f").cast("double") * F.col("n_bytes")).cast("bigint").alias("n"),
        F.lit("").alias("s"),
    )
    frames = sample_frames(binary, frame_bytes=16, every=4).select(
        F.lit("frame").alias("op"), F.col("id").alias("doc_id"),
        F.col("frame_idx").cast("bigint").alias("k"),
        F.lit(0).cast("bigint").alias("n"),
        F.hex("frame").alias("s"),
    )

    # real-decode leg: synthesize genuine BMP/WAV containers from doc_id
    # (deterministic, so DuckDB can recompute the decoded sums in closed
    # form), then run the production media_meta decode path.
    @F.pandas_udf("binary")
    def _synth_payload(ids: pd.Series) -> pd.Series:
        import numpy as np

        from dataforge_spark import codecs

        pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]],
                       dtype=np.uint8)
        out = []
        for rid in ids:
            rid = int(rid)
            v = rid % 8
            if v == 0:
                px = ((rid + np.arange(96)) % 256).astype(np.uint8)
                out.append(codecs.encode_bmp(px.reshape(4, 8, 3)))
            elif v == 1:
                s = (((rid * 7 + np.arange(32) * 13) % 65536) - 32768).astype(
                    np.int16
                )
                out.append(codecs.encode_wav(s, sample_rate=8000))
            elif v == 2:
                px = ((rid + np.arange(96)) % 256).astype(np.uint8)
                out.append(codecs.encode_png(px.reshape(4, 6, 4)))
            elif v == 3:  # grayscale (color type 0)
                px = ((rid + np.arange(24)) % 256).astype(np.uint8)
                out.append(codecs.encode_png(px.reshape(3, 8, 1)))
            elif v == 4:  # gray+alpha (color type 4)
                px = ((rid + np.arange(40)) % 256).astype(np.uint8)
                out.append(codecs.encode_png(px.reshape(4, 5, 2)))
            elif v == 5:  # palette + tRNS (color type 3 → RGBA lookup);
                # round 11: packed at depth 2 (sub-byte scanlines) — the
                # decoded RGBA is identical, so the oracle SQL is
                # unchanged while the row now attests the 1/2/4-bit path
                idx = ((rid + np.arange(25)) % 4).astype(np.uint8)
                out.append(codecs.encode_png_palette(
                    idx.reshape(5, 5), pal, trns=bytes([10, 20]), depth=2))
            elif v == 6:  # 16-bit grayscale, Adam7-interlaced
                px = ((rid * 3 + np.arange(16) * 257) % 65536).astype(np.uint16)
                out.append(codecs.encode_png(px.reshape(4, 4, 1), interlace=True))
            else:  # three-frame GIF (lossless LZW)
                frames = [((rid + f * 16 + np.arange(16)) % 4)
                          .astype(np.uint8).reshape(4, 4) for f in range(3)]
                out.append(codecs.encode_gif(frames, pal))
        return pd.Series(out)

    media = media_meta(
        docs.select("doc_id", _synth_payload("doc_id").alias("payload"))
    ).select(
        F.lit("media").alias("op"), F.col("id").alias("doc_id"),
        F.col("content_sum").alias("k"),
        F.col("n_samples").alias("n"),
        F.concat(
            "kind", F.lit(":"), F.col("width").cast("string"), F.lit("x"),
            F.col("height").cast("string"), F.lit("@"),
            F.col("sample_rate").cast("string"),
        ).alias("s"),
    )

    # resize leg (round 10): decode → 4×4 NEAREST resize → lossless PNG
    # re-encode → decode AGAIN via media_meta; k = the resized pixel sum.
    # Nearest-neighbor index maps are exact integer functions
    # (src = floor((out+0.5)·src_dim/4)), so DuckDB recomputes the whole
    # chain closed-form for every image variant; WAV (doc_id ≡ 1 mod 8)
    # is excluded — resize is an image operator.
    from dataforge_spark.multimodal import resize_images, sample_media_frames

    imgs = docs.where(F.col("doc_id") % 8 != 1).select(
        "doc_id", _synth_payload("doc_id").alias("payload")
    )
    resized = resize_images(imgs, 4, 4, method="nearest")
    rz = media_meta(
        resized.select(F.col("id").alias("doc_id"), "payload")
    ).select(
        F.lit("resize").alias("op"), F.col("id").alias("doc_id"),
        F.col("content_sum").alias("k"),
        F.col("n_samples").alias("n"),
        F.concat(
            "kind", F.lit(":"), F.col("width").cast("string"), F.lit("x"),
            F.col("height").cast("string"), F.lit("@"),
            F.col("sample_rate").cast("string"),
        ).alias("s"),
    )

    # vframes leg (round 10): REAL frame extraction — every 2nd frame of
    # the 3-frame GIFs (frames 0 and 2), each re-encoded as PNG and
    # decoded AGAIN; k = that frame's pixel sum, closed-form in DuckDB
    # because GIF's LZW is lossless. The composite id (doc_id·4 +
    # frame_idx) threads the frame ordinal through media_meta.
    gifs = docs.where(F.col("doc_id") % 8 == 7).select(
        "doc_id", _synth_payload("doc_id").alias("payload")
    )
    vf = sample_media_frames(gifs, every=2)
    vleg = media_meta(
        vf.select((F.col("id") * 4 + F.col("frame_idx")).alias("cid"), "payload"),
        id_col="cid",
    ).select(
        F.lit("vframes").alias("op"),
        F.floor(F.col("id") / 4).cast("bigint").alias("doc_id"),
        F.col("content_sum").alias("k"),
        F.col("n_samples").alias("n"),
        F.concat(F.lit("f"), (F.col("id") % 4).cast("string")).alias("s"),
    )
    return (
        meta.unionByName(feat).unionByName(frames).unionByName(media)
        .unionByName(rz).unionByName(vleg)
    )


def q_stream_dedup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup + windowed streaming profile as one
    tagged union (op, k, s, n1, n2, v1, v2, v3):

    - ``dedup``:   k=event_id, s=event_type, v1=value — exactly-once
      keyed dedup over a stream with 10% planted duplicates;
    - ``profile``: k=window_start, n1=n_rows, n2=n_null, v1/v2/v3 =
      min/max/avg — per-hour windowed aggregation with late-data
      watermarking."""
    _utc(spark)
    ev = _events(spark, sf_dir)

    dup_path = _stream_input_path(
        spark, sf_dir, "dup",
        lambda: ev.unionByName(ev.where(F.col("event_id") % 10 == 0)),
    )
    deduped = run_to_memory(
        dedup_stream(
            read_events_stream(spark, dup_path, ev.schema),
            key_cols=["event_id"], ts_col="ts", watermark="1 hour",
        )
    ).select(
        F.lit("dedup").alias("op"),
        F.col("event_id").cast("string").alias("k"),
        F.col("event_type").alias("s"),
        F.lit(0).cast("bigint").alias("n1"), F.lit(0).cast("bigint").alias("n2"),
        F.round("value", 2).alias("v1"),
        F.lit(0.0).alias("v2"), F.lit(0.0).alias("v3"),
    )

    ev_path = _stream_input_path(spark, sf_dir, "ev", lambda: ev)
    prof = run_aggregate_to_memory(
        profile_stream(
            read_events_stream(spark, ev_path, ev.schema),
            ts_col="ts", value_col="value", window="1 hour", watermark="2 hours",
        )
    ).select(
        F.lit("profile").alias("op"),
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("k"),
        F.lit("").alias("s"),
        F.col("n_rows").cast("bigint").alias("n1"),
        F.col("n_null").cast("bigint").alias("n2"),
        F.round("v_min", 2).alias("v1"), F.round("v_max", 2).alias("v2"),
        F.round("v_avg", 4).alias("v3"),
    )
    return deduped.unionByName(prof)


def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both sessionizers as one tagged union (slot freed round 5 for the
    sliding-window row): the custom stateful streaming operator
    (applyInPandasWithState) and the built-in ``session_window`` batch
    twin (pure JVM). Pinned semantic differences live in the oracle:
    native end is EXCLUSIVE (last event + gap) and an exactly-gap quiet
    period starts a new session there (strict <). The stateful leg
    drains through the production parquet file sink (run_to_parquet_df):
    its output is row-proportional (~1 session/user/30min-gap), so the
    memory sink's driver-side collect was most of the row's cost at
    sf1."""
    from dataforge_spark.streaming import (
        run_to_parquet_df,
        sessionize_native,
        sessionize_stream,
    )

    _utc(spark)
    ev = _events(spark, sf_dir)
    path = _stream_input_path(spark, sf_dir, "ev", lambda: ev)
    stream = read_events_stream(spark, path, ev.schema)
    sessions = sessionize_stream(stream, user_col="user_id", ts_col="ts",
                                 gap_minutes=30)
    got = run_to_parquet_df(sessions)
    sel = lambda d, v: d.select(  # noqa: E731
        F.lit(v).alias("variant"), "user_id",
        F.col("session_id").cast("bigint").alias("session_id"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("s_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("s_end"),
    )
    native = sessionize_native(
        ev.select("user_id", "ts"), user_col="user_id", ts_col="ts", gap_minutes=30
    )
    return sel(got, "stateful").unionByName(sel(native, "native"))


def q_stream_sessionize_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only (round 10, VERDICT r9 task 1): the pure-JVM
    ``session_window`` sessionizer alone — the 100 TB scale path and the
    benched HEADLINE for sessionization. Differentially pinned identical
    to the stateful leg (the oracle union row stream_sessionize still
    runs both); no streaming query, no Python, whole-stage codegen."""
    from dataforge_spark.streaming import sessionize_native

    _utc(spark)
    ev = _events(spark, sf_dir)
    return sessionize_native(
        ev.select("user_id", "ts"), user_col="user_id", ts_col="ts", gap_minutes=30
    )


def q_stream_sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only (round 10): the ``applyInPandasWithState`` leg alone,
    drained through the production parquet sink — the
    semantics-that-need-state path (per-user session ORDINALS carried
    across micro-batches on an unbounded stream, which no built-in
    streaming operator can express). Its sf1 cost is floor-decomposed in
    PLANS.md: a null state fn (consume input, emit nothing) already pays
    ~80% of the row — the cost is the per-group JVM↔Python state
    protocol, not the session logic."""
    from dataforge_spark.streaming import run_to_parquet_df, sessionize_stream

    _utc(spark)
    ev = _events(spark, sf_dir)
    path = _stream_input_path(spark, sf_dir, "ev", lambda: ev)
    stream = read_events_stream(spark, path, ev.schema)
    sessions = sessionize_stream(stream, user_col="user_id", ts_col="ts",
                                 gap_minutes=30)
    return run_to_parquet_df(sessions)


def q_boundary_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bug-compat stage-boundary scrub (reference pipeline.py:72-100):
    numeric NULL→column median (fallback 0), string NULL→''."""
    from dataforge_spark.pipeline import boundary_scrub

    df = _li_nulls(spark, sf_dir)
    out = boundary_scrub(df)
    return out.select(
        "l_orderkey", "l_linenumber",
        F.round("qty", 4).alias("qty"), F.round("price", 4).alias("price"), "flag",
    )


def q_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension enrichment (beyond reference surface — SURVEY §2.11):
    fact table broadcast-joined to two dimension tables, then a grouped
    rollup. The plan must show BroadcastHashJoin on both dims — at 100 TB
    the fact side never shuffles for the join."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    enriched = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return enriched.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
    )


def q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-order multi-op pipeline (fill → dedup → cap → scale)."""
    df = dfio.with_row_id(_li_nulls(spark, sf_dir))
    out, _ = CleaningPipeline(collect_metrics=False).run(
        df,
        {
            "missing_values": {"enabled": True, "strategy": "fill_median",
                               "columns": ["qty", "price", "flag"]},
            "duplicates": {"enabled": True},
            "outliers": {"enabled": True, "method": "iqr", "action": "cap",
                         "columns": ["price"]},
            "normalization": {"enabled": True, "method": "minmax",
                              "columns": ["qty"]},
        },
    )
    return out.select("l_orderkey", "l_linenumber",
                      F.round("qty", 6).alias("qty"),
                      F.round("price", 4).alias("price"), "flag")


def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-interval point aggregation (relational.range_aggregate): every
    event value counted/summed into ±2 bands around anchor events via
    the distributed prefix-sum formulation — the pair set here is
    O(|P|·|I|·density) (~7.8M at sf0.1, ~10⁸ at sf1), so the
    pair-materializing cell-grid join (relational.range_join, kept for
    genuine pair production and pytest-covered) collapses exactly the
    rows this computes directly in O((|P|+|I|) log). The DuckDB oracle
    runs the naive BETWEEN join + GROUP BY; every band contains its own
    anchor point, so inner-join semantics agree."""
    from dataforge_spark.relational import range_aggregate

    ev = _events(spark, sf_dir).select("event_id", "value")
    intervals = (
        ev.where(F.col("event_id") % 50 == 0)
        .select(
            F.col("event_id").alias("iid"),
            (F.col("value") - 2).alias("lo"),
            (F.col("value") + 2).alias("hi"),
        )
    )
    out = range_aggregate(ev, intervals, point_col="value", lo_col="lo",
                          hi_col="hi", sum_cols=["event_id"])
    return out.where(F.col("n_pts") > 0).select(
        "iid", "n_pts",
        F.col("sum_event_id").cast("bigint").alias("sum_pid"),
    )


def q_curation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash split + stratified sample (curation.py) as one
    tagged union. Both assign rows by a pure md5 key hash — reproducible
    under retries/repartitioning (randomSplit/sampleBy are NOT), and the
    oracle recomputes the identical assignment in DuckDB, attesting every
    row's split, not just the counts. The 'sample' rows additionally key
    by SOURCE, the leakage-safe grouping (all docs of a source stay
    together).

    Round 11 added the 'zorder' leg: ``partitioning.zorder_write``
    clusters documents on the Morton code of (n_chars, lang) — quantile
    buckets for the numeric, xxhash buckets for the string — and the
    read-back must be row-identical to the base table (layout ops move
    rows, never change them); the multi-column row-group pruning the
    layout buys is pinned by ``tests/test_zorder.py`` footer-stats
    audits. Round 12 (VERDICT r11 task 4): the WRITE is amortized
    once-per-corpus via ``build_zorder_layout`` (bench reports it as
    ``zorder_write_sec``); this row keeps the READ side — the full
    read-back identity leg plus a predicate read that row-group
    pruning serves from the clustered layout.

    Round 13 adds the DSIR legs (functions/dsir.py — Xie et al.
    NeurIPS 2023 importance resampling, the published target-matching
    data-selection recipe): hashed unigram+bigram features (10k
    xxhash64 buckets, pure Catalyst), a Laplace-smoothed
    target-vs-raw log-ratio model (target = lang='en' docs, raw = all
    docs; fit once per corpus fingerprint like the IVF/PQ/classifier
    builds), per-doc log-importance-weights as INTEGER micro-nat sums
    (order-free — bit-identical under any partitioning or engine), and
    deterministic Gumbel top-k resampling of ceil(n/10) docs.
    ``dsir_w`` attests every document's weight; ``dsir_sel`` the full
    resampled set with ranks. The oracle twin
    (tools/oracle_recompute.dsir_expected) recomputes both
    sequentially — dict counting vs Spark explode/groupBy, a Python
    per-doc sum vs the broadcast-join + partial-agg path — from the
    same parquet, inlined as VALUES (same contract as the classifier
    and crawl twins)."""
    from dataforge_spark.curation import hash_split, stratified_sample
    from dataforge_spark.functions.dsir import dsir_select, dsir_weights

    docs = _t(spark, sf_dir, "documents")
    split = hash_split(
        docs, {"train": 0.9, "val": 0.05, "test": 0.05},
        key_cols=["doc_id"], seed=42,
    ).select(F.lit("split").alias("op"), "doc_id", F.col("split").alias("label"))
    samp = stratified_sample(
        docs, {"en": 0.5, "de": 0.25, "fr": 1.0}, "lang",
        key_cols=["source"], seed=7,
    ).select(F.lit("sample").alias("op"), "doc_id", F.col("lang").alias("label"))
    zpath, _ = build_zorder_layout(spark, sf_dir)
    ztab = spark.read.parquet(zpath)
    zleg = ztab.select(
        F.lit("zorder").alias("op"), "doc_id", F.col("lang").alias("label")
    )
    # the read the layout exists FOR: a two-column predicate the Morton
    # clustering makes row-group-prunable
    zpruned = ztab.where(
        (F.col("n_chars") < 200) & (F.col("lang") == "en")
    ).select(
        F.lit("zorder_pruned").alias("op"), "doc_id",
        F.col("lang").alias("label"),
    )
    model, k = _dsir_model(spark, sf_dir)
    # r14 (guide §1.2): the weights projection (repartition + gram-hash
    # scoring of every document) fed BOTH the dsir_w leg and, recomputed
    # from scratch inside dsir_select, the dsir_sel leg. Compute it once
    # and cut lineage — (doc_id, long) rows, output-sized, recomputed
    # from parquet per invocation (not a cross-run cache); both legs now
    # read the one scoring pass. LAZY checkpoint: it materializes inside
    # the union job itself, so sharing costs no extra job (A/B min-of-6:
    # old 0.663 / eager ckpt 0.545 / lazy 0.504 s, identical checksums).
    w = dsir_weights(docs, model).localCheckpoint(eager=False)
    wleg = w.select(
        F.lit("dsir_w").alias("op"), "doc_id",
        F.col("dsir_logw_micro").cast("string").alias("label"),
    )
    sleg = dsir_select(docs, model, k, seed=0, weights=w).select(
        F.lit("dsir_sel").alias("op"), "doc_id",
        F.col("rank").cast("string").alias("label"),
    )
    return (
        split.unionByName(samp).unionByName(zleg).unionByName(zpruned)
        .unionByName(wleg).unionByName(sleg)
    )


def q_curation_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination sweep (curation.py): 5-gram overlap of
    every corpus doc against a held-out eval set (docs with id % 97 == 0),
    eval grams broadcast, corpus never shuffled by gram."""
    from dataforge_spark.curation import contamination

    docs = _t(spark, sf_dir, "documents")
    eval_set = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    out = contamination(corpus, eval_set, text_col="text", id_col="doc_id", n=5)
    return out.select(
        F.col("id").alias("doc_id"), "n_grams", "n_hits",
        F.col("contaminated").cast("int").alias("contaminated"),
    )


def q_curation_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (curation.py): whitespace token
    counts, distributed prefix sum (two-phase, no global window), packs
    of 512 tokens. The oracle is a plain SQL window cumsum — same
    numbers, single-task plan; the Spark side is the scale formulation."""
    from dataforge_spark.curation import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    out = pack_sequences(docs, budget=512, id_col="doc_id", text_col="text")
    return out.select(
        F.col("id").alias("doc_id"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "start_offset", "pack_id",
    )


def q_crawl_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end crawl → training-data integration row (VERDICT r11
    task 5): the sf documents wrapped as WET conversion records, run
    through the FULL ``crawl.crawl_to_training_data`` composition
    (WARC read → language gate → canonical-URL keep-first dedup →
    quality gate → Gopher gate → minhash near-dedup → BPE encode →
    fixed-length chunking → TFRecord write), then the TFRecord output
    read back. Output: one ``(stage, n)`` row per pipeline stage plus
    three read-back checksums — ``tfr_samples`` / ``tfr_tokens`` /
    ``tfr_ids_sum`` (the sum of every token id in every chunk, which
    pins the BPE vocabulary, the merges, the encoding, the chunk
    boundaries, AND the TFRecord round-trip in one number — VERDICT r11
    task 6's BPE end-to-end leg).

    Planted structure: every ``doc_id % 5 == 0`` document is duplicated
    at ``doc_id + 100000``; duplicates with even original id share the
    original's CANONICAL url under a different raw spelling
    (``http://Example.com/doc/N`` vs ``http://example.com:80/doc/N`` —
    case + default port), so URL dedup must remove them (keep-first =
    the 'E' < 'e' raw-string order); the odd-id duplicates get distinct
    urls and must survive to the minhash stage, which removes them as
    exact-text near-dups. Round 13 (VERDICT r12 task 6): every
    ``doc_id % 3 == 0`` document additionally carries the 45-word
    all-distinct stopword suffix ``tools.oracle_recompute.
    CRAWL_GOPHER_SUFFIX`` (applied on the ORIGINAL id, before
    duplication, so dup pairs stay byte-identical) — the ``gopher=True``
    gate now runs in-loop with a nonzero, oracle-pinned survivor set
    (suffixed docs pass all seven rules; the unsuffixed synthetic
    vocabulary fails the required-stopword rule).

    The oracle is a pure-Python twin (tools/oracle_recompute.py
    ``crawl_expected``): every gate recomputed sequentially (same
    formulas as the SQL replicas of quality/gopher), xxhash64 doc ids
    via the bit-equal pure-Python xxh64, minhash survivors via a FULL
    sequential minhash simulation — signatures, 16×4 banding, and
    exact-Jaccard candidate verification re-run on the bit-equal
    pure-Python xxh64 (``_minhash_survivors_twin``), assumption-free
    about LSH recall — and an INDEPENDENT O(n²)-recount BPE merge loop
    + encoder (no incremental pair bookkeeping, where the bugs would
    hide).

    BPE-retrain amortization (round 13, VERDICT r12 task 5): the
    trained tokenizer persists to disk keyed on the corpus fingerprint
    + pipeline params, exactly like the IVF/PQ/z-order builds — a warm
    call passes ``tokenizer=`` and skips the refit. The twin always
    retrains independently, so a stale or wrong cache is CAUGHT by the
    gate (ids_sum mismatch), never masked; a corpus change rotates the
    fingerprint and forces a refit."""
    from dataforge_spark.crawl import crawl_to_training_data
    from dataforge_spark.functions.bpe import BpeTokenizer
    from dataforge_spark.tfrecord import read_tfrecord
    from dataforge_spark.warc import write_warc
    from tools.oracle_recompute import CRAWL_GOPHER_SUFFIX

    ident = _corpus_ident(sf_dir, "documents")
    # _g1: fixture layout version (round 13 added the Gopher suffix) —
    # a version bump invalidates cached WET dirs from earlier rounds
    wet_path = f"/tmp/dataforge_crawl_wet_{ident}_g1"
    marker = os.path.join(wet_path, "_BENCH_READY")
    if not os.path.exists(marker):
        docs = _t(spark, sf_dir, "documents").select(
            "doc_id",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.col("text"), F.lit(CRAWL_GOPHER_SUFFIX)),
            ).otherwise(F.col("text")).alias("text"),
            "lang",
        )
        dups = docs.where(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang"
        )
        orig = docs.withColumn(
            "uri", F.concat(F.lit("http://Example.com/doc/"), F.col("doc_id"))
        )
        d_same = dups.where(F.col("doc_id") % 10 == 0).withColumn(
            "uri",
            F.concat(
                F.lit("http://example.com:80/doc/"), F.col("doc_id") - 100000
            ),
        )
        d_uniq = dups.where(F.col("doc_id") % 10 != 0).withColumn(
            "uri", F.concat(F.lit("http://example.com/copy/"), F.col("doc_id"))
        )
        wet = orig.unionByName(d_same).unionByName(d_uniq)
        write_warc(
            wet.coalesce(4), wet_path,
            payload_col="text", uri_col="uri", language_col="lang",
        )
        open(marker, "w").close()

    out_path = f"/tmp/dataforge_crawl_out_{uuid.uuid4().hex[:8]}"
    tok_cache = f"/tmp/dataforge_crawl_bpe_{ident}_g1_v512.json"
    tok = BpeTokenizer.load(tok_cache) if os.path.exists(tok_cache) else None
    report, tok = crawl_to_training_data(
        spark, wet_path, out_path,
        tokenizer=tok,
        vocab_size=512, seq_len=64,
        keep_langs=["en", "de", "fr", "es"],
        min_quality=0.75,
        gopher=True,
        minhash_threshold=0.8,
    )
    if not os.path.exists(tok_cache):
        tmp = f"{tok_cache}.{os.getpid()}.tmp"
        tok.save(tmp)
        os.replace(tmp, tok_cache)  # atomic under concurrent gate runs
    back = read_tfrecord(
        spark, out_path,
        "doc_id bigint, chunk_idx bigint, input_ids array<bigint>, "
        "n_tokens bigint",
    )
    agg = back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_tokens").alias("t"),
        F.sum(
            F.aggregate(
                "input_ids", F.lit(0).cast("bigint"), lambda a, x: a + x
            )
        ).alias("s"),
    ).collect()[0]
    stages = [
        ("records_in", report["records_in"]),
        ("after_lang_filter", report["after_lang_filter"]),
        ("after_url_dedup", report["after_url_dedup"]),
        ("after_quality", report["after_quality"]),
        ("after_gopher", report["after_gopher"]),
        ("after_near_dedup", report["after_near_dedup"]),
        ("vocab_size", report["vocab_size"]),
        ("samples_out", report["samples_out"]),
        ("tokens_out", report["tokens_out"]),
        ("tfr_samples", int(agg["n"])),
        ("tfr_tokens", int(agg["t"] or 0)),
        ("tfr_ids_sum", int(agg["s"] or 0)),
    ]
    return spark.createDataFrame(stages, "stage string, n bigint")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """50 queries covering every SURVEY §2 operator + the LLM-pipeline
    extensions. The driver evaluates entries in dict order (observed cap:
    first 50), so compositions come first; related operators share
    tagged-union composites (m1+m2, m3+m4, m8+m9, o2+o3, t2+t3+t4+t6,
    e1+e3, the embedding-dedup family, x2+x11, y2+y3, n1+n5, n2+n3, the
    mm suite, stream dedup+profile) so the whole registry fits the
    window — every query has an oracle. Round 4 freed three slots by
    merging (intercorpus dedup, native sessionize, isolation forest);
    round 9 folded sim_cosine_topk into sim_pq_topk; round 12 folded
    sim_lsh_topk + the SemDeDup legs into dedup_embedding and spent the
    slot on crawl_e2e."""
    return {
        # --- round-9 row first (slot freed by folding sim_cosine_topk
        # into this union's `exact` leg) ---
        "sim_pq_topk": q_sim_pq_topk,
        # --- round-5 new driver rows (slots freed by merging the
        # exact/intercorpus dedup legs and the two sessionizers) ---
        "dedup_spans": q_dedup_spans,
        "stream_window_agg": q_stream_window_agg,
        # --- round-4 driver rows ---
        "dedup_exact_intercorpus": q_dedup_exact_intercorpus,
        "o4_isolation_forest": q_o4_isolation_forest,
        "sim_ivf_disk_topk": q_sim_ivf_disk_topk,
        # --- round-2/3 queries ---
        "pipeline_e2e": q_pipeline_e2e,
        "boundary_scrub": q_boundary_scrub,
        "join_enrich": q_join_enrich,
        "join_asof": q_join_asof,
        "join_range": q_join_range,
        "llm_prep_pipeline": q_llm_prep_pipeline,
        "sim_ivf_topk": q_sim_ivf_topk,
        "txt_metrics": q_txt_metrics,
        "e2_onehot_encode": q_e2_onehot_encode,
        "mm_suite": q_mm_suite,
        "stream_dedup_profile": q_stream_dedup_profile,
        "stream_sessionize": q_stream_sessionize,
        "curation_split": q_curation_split,
        "curation_contamination": q_curation_contamination,
        "curation_pack": q_curation_pack,
        "dedup_simhash_verified": q_dedup_simhash_verified,
        # r12: carries the former sim_lsh_topk row + the new SemDeDup
        # legs (slot freed for crawl_e2e under the driver's 50-row cap)
        "dedup_embedding": q_dedup_embedding,
        # --- round 12: end-to-end crawl integration row ---
        "crawl_e2e": q_crawl_e2e,
        "dedup_minhash_verified": q_dedup_minhash_verified,
        "y2_lsh_fuzzy_scale": q_y2_lsh_fuzzy_scale,
        # --- driver-green in round 2 ---
        "s1_io_roundtrip": q_s1_io_roundtrip,
        "s4_profile": q_s4_profile,
        "m1_m2_drop_rows": q_m1_m2_drop_rows,
        "m3_m4_drop_columns": q_m3_m4_drop_columns,
        "m5_m6_fill_stats": q_m5_m6_fill_stats,
        "dedup_components": q_dedup_components,
        "m7_fill_mode": q_m7_fill_mode,
        "m8_m9_ordered_fill": q_m8_m9_ordered_fill,
        "d1_dedup_keep_first": q_d1_dedup_keep_first,
        "o1_iqr_remove": q_o1_iqr_remove,
        "o2_o3_robust_remove": q_o2_o3_robust_remove,
        "o6_o7_outlier_actions": q_o6_o7_outlier_actions,
        "t1_manual_cast": q_t1_manual_cast,
        "t234_auto_convert": q_t234_auto_convert,
        "x_text_suite": q_x_text_suite,
        "dt1_datetime_features": q_dt1_datetime_features,
        "e1_e3_encode": q_e1_e3_encode,
        "y1_common_typos": q_y1_common_typos,
        "y2_y3_difflib_fix": q_y2_y3_difflib_fix,
        "y4_typo_stats": q_y4_typo_stats,
        "n1_n5_standard_roundtrip": q_n1_n5_standard_roundtrip,
        "n2_n3_n4_scale": q_n2_n3_n4_scale,
        "n6_scaling_stats": q_n6_scaling_stats,
        "dedup_jaccard_pairs": q_dedup_jaccard_pairs,
    }


# ---------------------------------------------------------------------------
# oracles — DuckDB ANSI SQL equivalents (omitted for non-SQL-expressible:
# LSH-banded candidate generation, simhash, byte-histogram features)
# ---------------------------------------------------------------------------


def _simhash_oracle() -> str:
    """Expected simhash pair counts, recomputed from the oracle-scale data
    with the Spark-free reference path (tools/oracle_recompute.py). Falls
    back to the sf0.01 closed-form constants only if the recompute is
    unavailable — with a logged warning + traceback: the fallback is
    wrong at other SFs and exists so one harness hiccup can't error all
    50 oracle rows."""
    try:
        from tools.oracle_recompute import oracle_sf_dir, simhash_expected

        n_pairs, n_brute, n_dis, n_planted = simhash_expected(oracle_sf_dir())
    except Exception:  # pragma: no cover - harness resilience
        import logging

        logging.getLogger("dataforge_spark").warning(
            "simhash oracle recompute failed; falling back to the sf0.01 "
            "literals (independence property LOST for this check)",
            exc_info=True,
        )
        n_pairs, n_brute, n_dis, n_planted = 126, 126, 0, 100
    return f"""
        SELECT CAST({n_pairs} AS BIGINT) AS n_pairs,
               CAST({n_brute} AS BIGINT) AS n_brute,
               CAST({n_dis} AS BIGINT) AS n_disagree,
               CAST({n_planted} AS BIGINT) AS n_planted
    """


def _iforest_oracle() -> str:
    """Expected isolation-forest removal outcome, recomputed from the
    DuckDB-fetched column at oracle-construction time (see
    tools/oracle_recompute.py). Same fallback contract as above."""
    try:
        from tools.oracle_recompute import iforest_expected, oracle_sf_dir

        n_kept, kept_id_sum = iforest_expected(oracle_sf_dir())
    except Exception:  # pragma: no cover - harness resilience
        import logging

        logging.getLogger("dataforge_spark").warning(
            "isolation-forest oracle recompute failed; falling back to the "
            "sf0.01 literals (independence property LOST for this check)",
            exc_info=True,
        )
        n_kept, kept_id_sum = 9001, 44965329
    return f"""
        SELECT CAST({n_kept} AS BIGINT) AS n_kept,
               CAST({kept_id_sum} AS BIGINT) AS kept_id_sum
    """


def _dsir_oracle_legs() -> str:
    """UNION ALL legs for curation_split's DSIR rows, recomputed at
    oracle-construction time by the sequential twin
    (tools/oracle_recompute.dsir_expected) and inlined as VALUES — the
    engine's integer micro-nat weights make the comparison exact, not
    approximate. Fallback on recompute failure: one impossible row so
    only curation_split fails (same contract as _crawl_oracle)."""
    try:
        from tools.oracle_recompute import dsir_expected, oracle_sf_dir

        weights, selected = dsir_expected(oracle_sf_dir())
    except Exception:  # pragma: no cover - harness resilience
        import logging

        logging.getLogger("dataforge_spark").warning(
            "DSIR oracle recompute failed; curation_split will mismatch",
            exc_info=True,
        )
        weights, selected = ((-1, -1),), ((-1, -1),)
    wvals = ", ".join(f"({d}, {w})" for d, w in weights)
    svals = ", ".join(f"({d}, {r})" for d, r in selected)
    return f"""
        UNION ALL
        SELECT 'dsir_w' AS op, CAST(v.doc_id AS BIGINT) AS doc_id,
               CAST(v.w AS VARCHAR) AS label
        FROM (VALUES {wvals}) v(doc_id, w)
        UNION ALL
        SELECT 'dsir_sel' AS op, CAST(s.doc_id AS BIGINT) AS doc_id,
               CAST(s.rank AS VARCHAR) AS label
        FROM (VALUES {svals}) s(doc_id, rank)
    """


def _crawl_oracle() -> str:
    """Expected per-stage survivor counts + token checksums for
    q_crawl_e2e, recomputed at oracle-construction time by the
    sequential pipeline twin (tools/oracle_recompute.crawl_expected).
    Same fallback contract as _simhash_oracle: a single impossible row
    so only this row fails on a recompute hiccup."""
    try:
        from tools.oracle_recompute import crawl_expected, oracle_sf_dir

        stages = crawl_expected(oracle_sf_dir())
    except Exception:  # pragma: no cover - harness resilience
        import logging

        logging.getLogger("dataforge_spark").warning(
            "crawl oracle recompute failed; crawl_e2e will mismatch",
            exc_info=True,
        )
        stages = (("recompute_failed", -1),)
    return " UNION ALL ".join(
        f"SELECT '{s}' AS stage, CAST({n} AS BIGINT) AS n" for s, n in stages
    )


def _clf_oracle_values() -> str:
    """Per-doc classifier probabilities recomputed at oracle-construction
    time by the sequential numpy training twin
    (tools/oracle_recompute.classifier_expected) — a second, Spark-free
    implementation of the full Adagrad fit + scoring, inlined as a
    VALUES table. Fallback on recompute failure: a single impossible row
    so only txt_metrics fails, not all oracle rows (same contract as
    _simhash_oracle)."""
    try:
        from tools.oracle_recompute import classifier_expected, oracle_sf_dir

        vals = classifier_expected(oracle_sf_dir())
    except Exception:  # pragma: no cover - harness resilience
        import logging

        logging.getLogger("dataforge_spark").warning(
            "classifier oracle recompute failed; txt_metrics clf columns "
            "will mismatch",
            exc_info=True,
        )
        vals = ((-1, 0.5),)
    rows = ", ".join(f"({i}, {p!r})" for i, p in vals)
    return f"(VALUES {rows}) AS clfe(doc_id, p)"


def oracle_sql() -> dict[str, str]:
    mode = (
        "(SELECT {c} FROM t WHERE {c} IS NOT NULL "
        "GROUP BY {c} ORDER BY count(*) DESC, {c} ASC LIMIT 1)"
    )
    sql: dict[str, str] = {}

    sql["s1_io_roundtrip"] = """
        WITH stats AS (
          SELECT count(*) AS n, round(sum(value), 2) AS sum_value,
                 count(DISTINCT props) AS n_props,
                 count(DISTINCT event_type) AS n_types
          FROM events
        )
        SELECT n, sum_value, n_props, n_types,
               CAST(0 AS BIGINT) AS n_corrupt, 'csv' AS variant FROM stats
        UNION ALL
        SELECT n, sum_value, n_props, n_types,
               CAST(2 AS BIGINT) AS n_corrupt, 'jsonl' AS variant FROM stats
        UNION ALL
        SELECT n, sum_value, n_props, n_types,
               CAST(0 AS BIGINT) AS n_corrupt, 'orc' AS variant FROM stats
        UNION ALL
        SELECT n, sum_value, n_props, n_types,
               CAST(0 AS BIGINT) AS n_corrupt, 'avro' AS variant FROM stats
        UNION ALL
        SELECT count(*) AS n,
               round(sum(list_sum(CAST(embedding AS DOUBLE[]))), 2) AS sum_value,
               count(DISTINCT len(embedding)) AS n_props,
               count(DISTINCT label) AS n_types,
               CAST(0 AS BIGINT) AS n_corrupt, 'avro_arr' AS variant
        FROM embeddings
        UNION ALL
        SELECT n, sum_value, n_props, n_types,
               CAST(0 AS BIGINT) AS n_corrupt, 'tfrecord' AS variant FROM stats
        UNION ALL
        SELECT count(*) AS n,
               round(CAST(sum(octet_length(encode(text))) AS DOUBLE), 2)
                 AS sum_value,
               count(DISTINCT doc_id) AS n_props,
               count(DISTINCT lang) AS n_types,
               CAST(0 AS BIGINT) AS n_corrupt, 'warc' AS variant
        FROM documents
    """

    sql["s4_profile"] = """
        WITH t AS (
          SELECT CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value,
                 CASE WHEN event_id % 11 = 0 THEN 'unknown' ELSE props END AS props
          FROM events
        ), n AS (SELECT count(*) AS n_rows FROM t)
        SELECT 'value' AS col_name,
               (SELECT count(*) FROM t WHERE value IS NULL OR isnan(value)) AS n_missing,
               (SELECT count(DISTINCT value) FROM t) AS n_unique,
               n_rows, CAST(0 AS BIGINT) AS dup_rows,
               CAST(n_rows * 8 AS BIGINT) AS est_bytes FROM n
        UNION ALL
        SELECT 'props',
               (SELECT count(*) FROM t WHERE props IS NULL OR lower(trim(props)) IN
                 ('nan','null','none','na','n/a','missing','unknown','','nil','undefined')),
               (SELECT count(DISTINCT props) FROM t),
               n_rows, CAST(0 AS BIGINT),
               (SELECT CAST(sum(strlen(props)) AS BIGINT) FROM t) FROM n
    """

    sql["m1_m2_drop_rows"] = f"""
        WITH t AS ({LI_SQL})
        SELECT *, 'drop_rows' AS variant FROM t
        WHERE qty IS NOT NULL AND price IS NOT NULL AND flag IS NOT NULL
        UNION ALL
        SELECT *, 'threshold' FROM t
        WHERE (CASE WHEN qty IS NULL THEN 0 ELSE 1 END
             + CASE WHEN price IS NULL THEN 0 ELSE 1 END
             + CASE WHEN flag IS NULL THEN 0 ELSE 1 END) >= 2
    """

    sql["m3_m4_drop_columns"] = """
        SELECT 'drop_columns' AS variant, 'l_orderkey,l_linenumber' AS kept_cols,
               count(*) AS n_rows FROM lineitem
        UNION ALL
        SELECT 'threshold_0.88', 'l_orderkey,l_linenumber,price,flag', count(*)
        FROM lineitem
    """

    sql["m5_m6_fill_stats"] = f"""
        WITH t AS ({LI_SQL})
        SELECT 'mean' AS variant, l_orderkey, l_linenumber,
          round(coalesce(qty,  (SELECT avg(qty) FROM t)), 4) AS qty,
          round(coalesce(price,(SELECT avg(price) FROM t)), 4) AS price,
          coalesce(flag, {mode.format(c='flag')}) AS flag
        FROM t
        UNION ALL
        SELECT 'median', l_orderkey, l_linenumber,
          round(coalesce(qty,  (SELECT quantile_cont(qty, 0.5) FROM t)), 4) AS qty,
          round(coalesce(price,(SELECT quantile_cont(price, 0.5) FROM t)), 4) AS price,
          coalesce(flag, {mode.format(c='flag')}) AS flag
        FROM t
    """

    sql["m7_fill_mode"] = f"""
        WITH t AS ({LI_SQL})
        SELECT l_orderkey, l_linenumber,
          round(coalesce(qty,  {mode.format(c='qty')}), 4) AS qty,
          round(coalesce(price,{mode.format(c='price')}), 4) AS price,
          coalesce(flag, {mode.format(c='flag')}) AS flag
        FROM t
    """

    sql["m8_m9_ordered_fill"] = """
        WITH t AS (
          SELECT event_id,
            CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS value,
            CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value_bf
          FROM events
        )
        SELECT event_id,
          round(last_value(value IGNORE NULLS) OVER (
            ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS value,
          round(first_value(value_bf IGNORE NULLS) OVER (
            ORDER BY event_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 2) AS value_bf
        FROM t
    """

    sql["d1_dedup_keep_first"] = """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) = 1
    """

    iqr_bounds = """
        (SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
                quantile_cont(l_extendedprice, 0.75) AS q3 FROM lineitem)
    """
    sql["o1_iqr_remove"] = f"""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem, {iqr_bounds} b
        WHERE (q3 - q1) = 0 OR NOT (
          l_extendedprice < q1 - 1.5 * (q3 - q1) OR
          l_extendedprice > q3 + 1.5 * (q3 - q1))
    """

    sql["o2_o3_robust_remove"] = """
        SELECT l_orderkey, l_linenumber, l_extendedprice, 'zscore' AS variant
        FROM lineitem,
          (SELECT avg(l_extendedprice) AS m, stddev_samp(l_extendedprice) AS s
           FROM lineitem) b
        WHERE s = 0 OR s IS NULL OR NOT (
          l_extendedprice < m - 2.5 * s OR l_extendedprice > m + 2.5 * s)
        UNION ALL
        SELECT l_orderkey, l_linenumber, l_extendedprice, 'mzscore'
        FROM lineitem,
          (SELECT quantile_cont(l_extendedprice, 0.5) AS md FROM lineitem) med,
          (SELECT quantile_cont(abs(l_extendedprice -
             (SELECT quantile_cont(l_extendedprice, 0.5) FROM lineitem)), 0.5) AS mad
           FROM lineitem) mad
        WHERE mad = 0 OR NOT (
          l_extendedprice < md - 3.5 * mad / 0.6745 OR
          l_extendedprice > md + 3.5 * mad / 0.6745)
    """

    sql["o6_o7_outlier_actions"] = f"""
        SELECT 'cap' AS op, l_orderkey, l_linenumber,
          round(CASE
            WHEN (q3 - q1) = 0 THEN l_extendedprice
            WHEN l_extendedprice < q1 - 1.5 * (q3 - q1) THEN q1 - 1.5 * (q3 - q1)
            WHEN l_extendedprice > q3 + 1.5 * (q3 - q1) THEN q3 + 1.5 * (q3 - q1)
            ELSE l_extendedprice END, 4) AS l_extendedprice
        FROM lineitem, {iqr_bounds} b
        UNION ALL
        SELECT 'log' AS op, l_orderkey, l_linenumber,
          round(CASE WHEN l_extendedprice > 0 THEN ln(1 + l_extendedprice)
                     ELSE l_extendedprice END, 6) AS l_extendedprice
        FROM lineitem
    """

    # ASOF LEFT JOIN is native in DuckDB — the exact oracle for
    # relational.asof_join's union-and-carry formulation.
    sql["join_asof"] = """
        WITH ev AS (
          SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us FROM events
        ),
        st AS (
          SELECT user_id, us, max(event_id) AS status_id, us AS s_us
          FROM ev WHERE event_id % 20 = 0 GROUP BY user_id, us
        )
        SELECT ev.event_id, ev.user_id, ev.us, st.status_id, st.s_us
        FROM ev ASOF LEFT JOIN st
          ON ev.user_id = st.user_id AND ev.us >= st.us
    """

    sql["t1_manual_cast"] = """
        SELECT event_id, CAST(CAST(value AS VARCHAR) AS DOUBLE) AS sval FROM events
    """

    sql["t234_auto_convert"] = """
        SELECT event_id,
          CAST(CAST(value AS VARCHAR) AS DOUBLE) AS num_str,
          CAST(user_id AS BIGINT) AS int_str,
          strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS dt_str,
          (event_id % 2 = 0) AS b_str,
          CAST(user_id AS VARCHAR) AS str_col
        FROM events
    """

    sql["x_text_suite"] = f"""
        WITH m AS (
          SELECT doc_id, text,
            '  <b>Hello ' || text ||
            '</b> visit https://ex.com/a?b=1 mail a.b@ex.com 42 cats!  ' AS s,
            '  a-1 ' || text || ' z*9  ' AS s2,
            'mail a.b@ex.com see https://x.io/p ssn 123-45-6789 ip 10.0.0.1 '
              || text AS s3
          FROM documents
        )
        SELECT doc_id, NULLIF(
          trim(regexp_replace(
            translate(
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    regexp_replace(lower(s), '<[^>]+>', '', 'g'),
                  '{_URL_RE}', '', 'g'),
                '{_EMAIL_RE}', '', 'g'),
              '\\d+', '', 'g'),
            '{_PUNCT_SQL}', '')
          , '\\s+', ' ', 'g')), '') AS messy,
          NULLIF(
            trim(regexp_replace(
              regexp_replace(upper(s2), '[^a-zA-Z0-9\\s]', '', 'g')
            , '\\s+', ' ', 'g')), '') AS t,
          NULLIF(regexp_replace(lower(text), '\\bspark\\b', 'SPARK', 'g'), '') AS text,
          NULLIF(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(s3,
                    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{{2,}}', '<EMAIL>', 'g'),
                  'http[s]?://[^\\s<>"]+', '<URL>', 'g'),
                '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b', '<SSN>', 'g'),
              '\\b(?:\\d{{1,3}}\\.){{3}}\\d{{1,3}}\\b', '<IP>', 'g'),
          '') AS pii_red,
          text || chr(10) || 'from & via' || chr(10) || 'x' AS html_txt,
          'Doc ' || doc_id AS html_title,
          'http://l/' || doc_id AS html_links
        FROM m
    """

    sql["join_range"] = """
        WITH iv AS (
          SELECT event_id AS iid, value - 2 AS lo, value + 2 AS hi
          FROM events WHERE event_id % 50 = 0
        )
        SELECT iv.iid, count(*) AS n_pts,
               CAST(sum(e.event_id) AS BIGINT) AS sum_pid
        FROM events e JOIN iv ON e.value BETWEEN iv.lo AND iv.hi
        GROUP BY iv.iid
    """

    sql["dt1_datetime_features"] = """
        SELECT o_orderkey,
          strftime(date_trunc('day', o_orderdate), '%Y-%m-%d %H:%M:%S') AS od_ts,
          CAST(year(o_orderdate) AS INTEGER) AS od_str_year,
          CAST(month(o_orderdate) AS INTEGER) AS od_str_month,
          CAST(day(o_orderdate) AS INTEGER) AS od_str_day
        FROM orders
    """

    sql["e1_e3_encode"] = """
        SELECT c_custkey,
          CAST(dense_rank() OVER (ORDER BY c_mktsegment) - 1 AS INTEGER) AS seg_label,
          c_mktsegment,
          count(*) OVER (PARTITION BY c_mktsegment)
            / (count(*) OVER ())::DOUBLE AS c_mktsegment_freq_encoded
        FROM customer
    """

    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    dummy_cols = ",\n          ".join(
        f"CASE WHEN c_mktsegment = '{v}' THEN 1 ELSE 0 END AS \"c_mktsegment_{v}\""
        for v in segs
    )
    seg2_cols = ",\n          ".join(
        f"CASE WHEN c_mktsegment = '{v}' THEN 1 ELSE 0 END AS \"seg2_{v}\""
        for v in segs[1:]
    )
    sql["e2_onehot_encode"] = f"""
        SELECT c_custkey,
          {dummy_cols},
          CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END AS "c_mktsegment_nan",
          {seg2_cols},
          CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END AS "seg2_nan"
        FROM customer
    """

    sql["y1_common_typos"] = r"""
        SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            'Teh goverment will recieve the managment report. ' || text,
            '(?i)\bteh\b', 'the', 'g'),
            '(?i)\bgoverment\b', 'government', 'g'),
            '(?i)\brecieve\b', 'receive', 'g'),
            '(?i)\bmanagment\b', 'management', 'g') AS msg
        FROM documents
    """

    # y2/y3: the driver-side difflib algorithm's outcome on this injection
    # is closed-form (clickk→click, vieww→view) — encoded directly.
    sql["y2_y3_difflib_fix"] = """
        SELECT event_id,
          CASE WHEN event_id % 97 = 0 THEN 'click' ELSE event_type END AS et_f,
          CASE WHEN event_id = 500 THEN 'view' ELSE event_type END AS et_s
        FROM events
    """

    # y2 scale path: LSH-candidate fuzzy matching on a constructed domain
    # whose correct outcome is closed-form — every typo ('x'-suffixed md5
    # prefix) returns to its base category.
    sql["y2_lsh_fuzzy_scale"] = """
        SELECT c_custkey,
          substr(md5((c_custkey % 40)::VARCHAR), 1, 12) AS seg
        FROM customer
    """

    sql["y4_typo_stats"] = """
        SELECT 'text' AS col_name, count(DISTINCT text) AS unique_values,
          count(text) AS total_values,
          round(count(DISTINCT text) / count(text)::DOUBLE, 6) AS uniqueness_ratio,
          round(avg(length(text)), 4) AS avg_length,
          round(var_samp(length(text)::DOUBLE), 4) AS length_variance
        FROM documents
        UNION ALL
        SELECT 'lang', count(DISTINCT lang), count(lang),
          round(count(DISTINCT lang) / count(lang)::DOUBLE, 6),
          round(avg(length(lang)), 4), round(var_samp(length(lang)::DOUBLE), 4)
        FROM documents
        UNION ALL
        SELECT 'source', count(DISTINCT source), count(source),
          round(count(DISTINCT source) / count(source)::DOUBLE, 6),
          round(avg(length(source)), 4), round(var_samp(length(source)::DOUBLE), 4)
        FROM documents
    """

    sql["n1_n5_standard_roundtrip"] = """
        SELECT l_orderkey, l_linenumber,
          round((l_quantity - mq) / sq, 6) AS v_qty,
          round((l_extendedprice - mp) / sp, 6) AS v_price,
          'standard' AS variant
        FROM lineitem,
          (SELECT avg(l_quantity) AS mq, stddev_pop(l_quantity) AS sq,
                  avg(l_extendedprice) AS mp, stddev_pop(l_extendedprice) AS sp
           FROM lineitem) s
        UNION ALL
        SELECT l_orderkey, l_linenumber,
          round(l_quantity, 4), round(l_extendedprice, 4), 'inverse'
        FROM lineitem
    """

    sql["n2_n3_n4_scale"] = """
        SELECT l_orderkey, l_linenumber,
          round((l_quantity - loq) / (hiq - loq) * 1.0 + 0.0, 6) AS v_qty,
          round((l_extendedprice - lop) / (hip - lop) * 1.0 + 0.0, 6) AS v_price,
          'minmax' AS variant
        FROM lineitem,
          (SELECT min(l_quantity) AS loq, max(l_quantity) AS hiq,
                  min(l_extendedprice) AS lop, max(l_extendedprice) AS hip
           FROM lineitem) s
        UNION ALL
        SELECT l_orderkey, l_linenumber,
          round((l_quantity - medq) / (q3q - q1q), 6),
          round((l_extendedprice - medp) / (q3p - q1p), 6),
          'robust'
        FROM lineitem,
          (SELECT quantile_cont(l_quantity, 0.5) AS medq,
                  quantile_cont(l_quantity, 0.25) AS q1q,
                  quantile_cont(l_quantity, 0.75) AS q3q,
                  quantile_cont(l_extendedprice, 0.5) AS medp,
                  quantile_cont(l_extendedprice, 0.25) AS q1p,
                  quantile_cont(l_extendedprice, 0.75) AS q3p
           FROM lineitem) s
        UNION ALL
        SELECT l_orderkey, l_linenumber,
          round(CASE WHEN nrm > 0 THEN l_quantity / nrm ELSE l_quantity END, 6),
          round(CASE WHEN nrm > 0 THEN l_extendedprice / nrm ELSE l_extendedprice END, 6),
          'l2'
        FROM (SELECT *,
                sqrt(power(coalesce(l_quantity, 0), 2)
                   + power(coalesce(l_extendedprice, 0), 2)) AS nrm
              FROM lineitem)
        UNION ALL
        SELECT l_orderkey, l_linenumber,
          CAST((CASE WHEN l_quantity > bq.q1 THEN 1 ELSE 0 END)
             + (CASE WHEN l_quantity > bq.q2 THEN 1 ELSE 0 END)
             + (CASE WHEN l_quantity > bq.q3 THEN 1 ELSE 0 END) AS DOUBLE),
          CAST((CASE WHEN l_extendedprice > bp.q1 THEN 1 ELSE 0 END)
             + (CASE WHEN l_extendedprice > bp.q2 THEN 1 ELSE 0 END)
             + (CASE WHEN l_extendedprice > bp.q3 THEN 1 ELSE 0 END) AS DOUBLE),
          'qbin4'
        FROM lineitem,
          (SELECT quantile_cont(l_quantity, 0.25) AS q1,
                  quantile_cont(l_quantity, 0.50) AS q2,
                  quantile_cont(l_quantity, 0.75) AS q3 FROM lineitem) bq,
          (SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
                  quantile_cont(l_extendedprice, 0.50) AS q2,
                  quantile_cont(l_extendedprice, 0.75) AS q3 FROM lineitem) bp
    """

    def _stats_row(c: str) -> str:
        return f"""
        SELECT '{c}' AS col_name,
          round(avg({c}), 4) AS mean, round(stddev_samp({c}), 4) AS std,
          round(min({c}), 4) AS "min", round(max({c}), 4) AS "max",
          round((SELECT quantile_cont({c}, 0.25) FROM lineitem), 4) AS q25,
          round((SELECT quantile_cont({c}, 0.75) FROM lineitem), 4) AS q75,
          round(avg(power({c} - m, 3)) / power(avg(power({c} - m, 2)), 1.5), 3) AS skew,
          round(avg(power({c} - m, 4)) / power(avg(power({c} - m, 2)), 2) - 3, 3) AS kurt
        FROM lineitem, (SELECT avg({c}) AS m FROM lineitem) s
        """

    sql["n6_scaling_stats"] = (
        _stats_row("l_quantity") + " UNION ALL " + _stats_row("l_extendedprice")
    )

    sql["dedup_components"] = r"""
        WITH RECURSIVE docs2 AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0
          UNION ALL
          SELECT doc_id + 200000, text FROM documents WHERE doc_id % 10 = 0
        ),
        toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM docs2
        ),
        sh AS (
          SELECT DISTINCT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS s
          FROM toks, UNNEST(CASE WHEN len(w) >= 3
                            THEN generate_series(1, len(w) - 2) ELSE [] END) AS u(i)
        ),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT id_a, id_b FROM common
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE c / (sa.n_sh + sb.n_sh - c)::DOUBLE >= 0.9
        ),
        edges AS (
          SELECT id_a AS u, id_b AS v FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs
        ),
        nodes AS (SELECT DISTINCT u AS id FROM edges),
        reach AS (
          SELECT id, id AS r FROM nodes
          UNION
          SELECT e.v, reach.r FROM edges e JOIN reach ON e.u = reach.id
        )
        SELECT id, min(r) AS component FROM reach GROUP BY id
    """

    # exact leg: keep-min-id per distinct text over documents ∪ the
    # planted copies; every planted copy (doc_id+100000) loses to its
    # original, and natural duplicate texts WITHIN documents (they exist
    # at sf1) also resolve to the smallest id — the general window, not
    # the all-texts-distinct shortcut.
    # intercorpus leg: anti-join against the every-5th-doc snapshot.
    sql["dedup_exact_intercorpus"] = """
        SELECT 'exact' AS variant, doc_id, text FROM (
          SELECT doc_id, text,
                 row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
          FROM documents
        ) WHERE rn = 1
        UNION ALL
        SELECT 'intercorpus' AS variant, d.doc_id, d.text
        FROM documents d
        WHERE NOT EXISTS (
          SELECT 1 FROM documents r
          WHERE r.doc_id % 5 = 0 AND r.text = d.text
        )
    """

    # Span-level exact dedup: consecutive 5-word spans, first global
    # (doc_id, span_idx) occurrence survives, documents rebuilt from
    # surviving spans (single-space joined; fully-deduped docs -> '').
    sql["dedup_spans"] = r"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM documents WHERE text IS NOT NULL
        ),
        spans AS (
          SELECT doc_id, i AS span_idx,
                 array_to_string(w[(i*5+1):(i*5+5)], ' ') AS span
          FROM toks, UNNEST(generate_series(
                 0, CAST(ceil(len(w)/5.0) AS BIGINT) - 1)) AS u(i)
        ),
        kept AS (
          SELECT doc_id, span_idx, span, row_number() OVER (
                   PARTITION BY span ORDER BY doc_id, span_idx) AS rn
          FROM spans
        )
        SELECT t.doc_id,
               coalesce(string_agg(k.span, ' ' ORDER BY k.span_idx), '') AS text,
               CAST(count(k.span) AS BIGINT) AS n_spans_kept
        FROM toks t LEFT JOIN (SELECT * FROM kept WHERE rn = 1) k
          ON t.doc_id = k.doc_id
        GROUP BY t.doc_id
    """

    sql["dedup_jaccard_pairs"] = r"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        ),
        sh AS (
          SELECT DISTINCT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS s
          FROM toks, UNNEST(CASE WHEN len(w) >= 3
                            THEN generate_series(1, len(w) - 2) ELSE [] END) AS u(i)
        ),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b,
          round(c / (sa.n_sh + sb.n_sh - c)::DOUBLE, 6) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE c / (sa.n_sh + sb.n_sh - c)::DOUBLE >= 0.05
    """

    sql["dedup_minhash_verified"] = r"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        ),
        sh AS (
          SELECT DISTINCT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS s
          FROM toks, UNNEST(CASE WHEN len(w) >= 3
                            THEN generate_series(1, len(w) - 2) ELSE [] END) AS u(i)
        ),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b,
          round(c / (sa.n_sh + sb.n_sh - c)::DOUBLE, 6) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE c / (sa.n_sh + sb.n_sh - c)::DOUBLE >= 0.9
    """

    # dedup_embedding: exact + LSH pair legs, the folded lsh_topk leg
    # (planted-NN recovery — closed-form with the perturbation formula),
    # and the SemDeDup legs (see q_dedup_embedding's docstring): the dup
    # graph at t=0.9 is disjoint 2-cliques, so greedy-leader survivors =
    # rows with no earlier-in-walk-order neighbor >= t. The k=1 centroid
    # for the sem_far_centroid walk is Lloyd's fixed point:
    # normalize(mean(normalized v)) — recomputed here per-dimension via
    # zipped unnest (normalization scale drops out of the ORDER).
    sql["dedup_embedding"] = """
        WITH fe AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        se AS (SELECT vec_id, v FROM fe WHERE vec_id % 10 = 0),
        p AS (
          SELECT vec_id, v,
            list_transform(generate_series(1, len(v)),
                           i -> v[i] + 0.02 * sin(vec_id + 100000 + i - 1)) AS pv
          FROM se
        ),
        u AS (SELECT vec_id, v FROM fe
              UNION ALL SELECT vec_id + 100000 AS vec_id, pv AS v FROM p),
        minid AS (
          SELECT a.vec_id FROM u a WHERE NOT EXISTS (
            SELECT 1 FROM u b WHERE b.vec_id < a.vec_id
              AND list_cosine_similarity(a.v, b.v) >= 0.9)
        ),
        n AS (SELECT vec_id, v,
                     sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
              FROM u),
        raw AS (SELECT vec_id, nrm,
                       unnest(generate_series(1, len(v))) AS i,
                       unnest(v) AS x
                FROM n),
        un AS (SELECT vec_id, i, x / nrm AS xn FROM raw),
        cen AS (SELECT i, avg(xn) AS c FROM un GROUP BY i),
        cosc AS (SELECT vec_id, sum(xn * c) AS cos_c
                 FROM un JOIN cen USING (i) GROUP BY vec_id),
        far AS (
          SELECT a.vec_id FROM u a JOIN cosc ca ON ca.vec_id = a.vec_id
          WHERE NOT EXISTS (
            SELECT 1 FROM u b JOIN cosc cb ON cb.vec_id = b.vec_id
            WHERE b.vec_id != a.vec_id
              AND list_cosine_similarity(a.v, b.v) >= 0.9
              AND (cb.cos_c < ca.cos_c
                   OR (cb.cos_c = ca.cos_c AND b.vec_id < a.vec_id)))
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim,
               'exact' AS variant
        FROM fe a JOIN fe b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.45
        UNION ALL
        SELECT vec_id AS id_a, vec_id + 100000 AS id_b,
               round(list_cosine_similarity(v, pv), 6) AS cos_sim,
               'lsh' AS variant
        FROM p
        WHERE round(list_cosine_similarity(v, pv), 6) >= 0.98
        UNION ALL
        SELECT vec_id + 100000 AS id_a, vec_id AS id_b,
               round(list_cosine_similarity(v, pv), 6) AS cos_sim,
               'lsh_topk' AS variant
        FROM p
        WHERE round(list_cosine_similarity(v, pv), 6) >= 0.9
        UNION ALL
        SELECT vec_id AS id_a, NULL::BIGINT AS id_b, NULL::DOUBLE AS cos_sim,
               'sem_min_id' AS variant FROM minid
        UNION ALL
        SELECT vec_id, NULL::BIGINT, NULL::DOUBLE,
               'sem_far_centroid' AS variant FROM far
        UNION ALL
        SELECT vec_id, NULL::BIGINT, NULL::DOUBLE,
               'sem_k4' AS variant FROM minid
        UNION ALL
        SELECT CAST(0 AS BIGINT), NULL::BIGINT, NULL::DOUBLE,
               'sem_k4_split_pairs' AS variant
    """

    # exact brute-force cosine top-k — the shared ground truth for the
    # whole ANN family (full-probe IVF, on-disk IVF, and the PQ row)
    BRUTE_TOPK = """
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embeddings WHERE vec_id < 10),
        c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
        s AS (SELECT query_id, neighbor_id,
                round(list_cosine_similarity(qv, cv), 6) AS cos_sim
              FROM q, c WHERE neighbor_id != query_id),
        topk AS (
          SELECT query_id, neighbor_id, cos_sim FROM s
          QUALIFY row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) <= 5
        )
    """

    # full-probe IVF must reproduce the exact top-k
    sql["sim_ivf_topk"] = BRUTE_TOPK + "SELECT * FROM topk"
    # Full-probe disk search must equal the exact top-k too.
    sql["sim_ivf_disk_topk"] = sql["sim_ivf_topk"]
    # PQ row (round 9): BOTH legs are held to the exact answer — the
    # brute-force leg by definition, the PQ leg because the exact
    # re-rank emits true cosines and the refine=24 pool covers the true
    # top-5 on this corpus (measured recall 1.0, bench recall block).
    sql["sim_pq_topk"] = BRUTE_TOPK + """
        SELECT query_id, neighbor_id, cos_sim, 'exact' AS variant FROM topk
        UNION ALL
        SELECT query_id, neighbor_id, cos_sim, 'pq' AS variant FROM topk
        UNION ALL
        SELECT query_id, neighbor_id, cos_sim, 'sq' AS variant FROM topk
    """

    # (r12: the sim_lsh_topk oracle moved into dedup_embedding's
    # lsh_topk leg when the rows merged.)

    # Expected pair counts RECOMPUTED at oracle-construction time from the
    # input data with a second, Spark-free implementation (pure-Python
    # xxh64 + numpy hamming sweep, tools/oracle_recompute.py) — replaces
    # round 5's pinned literals. The IN-QUERY banded-vs-brute-force
    # equality (n_disagree=0) remains the closed-form Manku guarantee.
    sql["dedup_simhash_verified"] = _simhash_oracle()

    # crawl_e2e: per-stage counts + BPE/TFRecord checksums from the
    # sequential pipeline twin (see _crawl_oracle / q_crawl_e2e).
    sql["crawl_e2e"] = _crawl_oracle()

    en = "'the','and','of','to','a','in','is','that','it','for'"
    de = "'der','die','das','und','ist','nicht','ein','mit','auf','zu'"
    fr = "'le','la','les','et','est','un','une','dans','que','pour'"
    es = "'el','la','los','de','y','es','un','una','en','por'"
    sql["txt_metrics"] = rf"""
        WITH t AS (
          SELECT doc_id, text,
            regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
            CASE WHEN trim(text) = '' THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok
          FROM documents
        ),
        h AS (
          SELECT doc_id, text, n_tok,
            len(list_filter(toks, x -> x IN ({en}))) AS hits_en,
            len(list_filter(toks, x -> x IN ({de}))) AS hits_de,
            len(list_filter(toks, x -> x IN ({fr}))) AS hits_fr,
            len(list_filter(toks, x -> x IN ({es}))) AS hits_es
          FROM t
        ),
        gop AS (
          SELECT doc_id, text,
            list_filter(regexp_split_to_array(trim(text), '\s+'),
                        w -> length(w) > 0) AS words,
            list_filter(regexp_split_to_array(text, '\n'),
                        l -> length(trim(l)) > 0) AS lines
          FROM documents
        ),
        gop2 AS (
          SELECT doc_id,
            len(words)::DOUBLE AS n_w,
            list_sum(list_transform(words, w -> length(w)))::DOUBLE AS tot,
            (len(regexp_extract_all(text, '#'))
             + len(regexp_extract_all(text, '(\.\.\.|…)')))::DOUBLE AS n_sym,
            len(lines)::DOUBLE AS n_l,
            len(list_filter(lines,
                l -> regexp_matches(ltrim(l), '^[•‣▪●·\-\*⁃]')))::DOUBLE AS n_bul,
            len(list_filter(lines,
                l -> regexp_matches(l, '(\.\.\.|…)[ \t]*$')))::DOUBLE AS n_ell,
            len(list_filter(words,
                w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE AS n_alpha,
            (CASE WHEN regexp_matches(lower(text), '\bthe\b') THEN 1 ELSE 0 END
             + CASE WHEN regexp_matches(lower(text), '\bbe\b') THEN 1 ELSE 0 END
             + CASE WHEN regexp_matches(lower(text), '\bto\b') THEN 1 ELSE 0 END
             + CASE WHEN regexp_matches(lower(text), '\bof\b') THEN 1 ELSE 0 END
             + CASE WHEN regexp_matches(lower(text), '\band\b') THEN 1 ELSE 0 END
             + CASE WHEN regexp_matches(lower(text), '\bthat\b') THEN 1 ELSE 0 END
             + CASE WHEN regexp_matches(lower(text), '\bhave\b') THEN 1 ELSE 0 END
             + CASE WHEN regexp_matches(lower(text), '\bwith\b') THEN 1 ELSE 0 END
            ) AS stop_hits
          FROM gop
        ),
        gverd AS (
          SELECT doc_id,
            CAST(n_w AS BIGINT) AS g_word_count,
            round(tot / n_w, 6) AS g_mean_word_len,
            round(n_sym / n_w, 6) AS g_symbol_word_ratio,
            round(n_bul / n_l, 6) AS g_bullet_line_frac,
            round(n_ell / n_l, 6) AS g_ellipsis_line_frac,
            round(n_alpha / n_w, 6) AS g_alpha_word_frac,
            CAST(stop_hits AS INTEGER) AS g_stopword_hits,
            (n_w >= 50 AND n_w <= 100000
             AND tot / n_w >= 3 AND tot / n_w <= 10
             AND n_sym / n_w <= 0.1
             AND n_bul / n_l < 0.9 AND n_ell / n_l < 0.3
             AND n_alpha / n_w >= 0.8 AND stop_hits >= 2) AS gopher_keep
          FROM gop2
        ),
        c4p AS (
          SELECT doc_id,
            concat_ws(chr(10),
              'A solid first sentence with enough words to pass easily.',
              text,
              CASE WHEN doc_id % 3 = 0 THEN 'Too short.'
                   ELSE 'Another full sentence with plenty of words to count.'
              END,
              CASE WHEN doc_id % 5 = 0
                   THEN 'This sentence mentions javascript cookies and other words.'
                   ELSE 'A third proper sentence closes the page neatly today.'
              END,
              CASE WHEN doc_id % 7 = 0 THEN 'if (x) {{ return y; }}'
                   ELSE 'A fourth sentence provides extra insurance for counting.'
              END) AS page
          FROM documents
        ),
        c4s AS (
          SELECT doc_id, page,
            list_filter(regexp_split_to_array(page, '\n'),
                        l -> length(trim(l)) > 0) AS lines_in,
            list_filter(regexp_split_to_array(page, '\n'),
              l -> regexp_matches(l, '[.!?"”]\s*$')
                AND len(list_filter(regexp_split_to_array(trim(l), '\s+'),
                                    w -> length(w) > 0)) >= 5
                AND NOT contains(lower(l), 'javascript')) AS kept
          FROM c4p
        ),
        c4v AS (
          SELECT doc_id,
            CAST(len(lines_in) AS INTEGER) AS c4_lines_in,
            CAST(len(kept) AS INTEGER) AS c4_lines_kept,
            CAST(len(regexp_extract_all(array_to_string(kept, chr(10)),
                 '[.!?]["”]?(\s|$)')) AS INTEGER) AS c4_sentences,
            (len(regexp_extract_all(array_to_string(kept, chr(10)),
                 '[.!?]["”]?(\s|$)')) >= 3
             AND NOT contains(lower(page), 'lorem ipsum')
             AND NOT contains(lower(page), '{{')) AS c4_keep
          FROM c4s
        ),
        clf AS (SELECT doc_id, p FROM {_clf_oracle_values()})
        SELECT h.doc_id,
          CAST(n_tok AS INTEGER) AS n_tokens,
          CAST(len(regexp_extract_all(text, '\w+|[^\w\s]', 0)) AS INTEGER)
            AS n_regex_tokens,
          CASE
            WHEN length(text) > 0
                 AND len(regexp_extract_all(text, '\p{{Han}}'))::DOUBLE
                     / length(text) > 0.3 THEN 'zh'
            WHEN hits_en > 0 AND hits_en >= hits_de AND hits_en >= hits_fr
                 AND hits_en >= hits_es THEN 'en'
            WHEN hits_de > 0 AND hits_de >= hits_en AND hits_de >= hits_fr
                 AND hits_de >= hits_es THEN 'de'
            WHEN hits_fr > 0 AND hits_fr >= hits_en AND hits_fr >= hits_de
                 AND hits_fr >= hits_es THEN 'fr'
            WHEN hits_es > 0 AND hits_es >= hits_en AND hits_es >= hits_de
                 AND hits_es >= hits_fr THEN 'es'
            ELSE 'unknown' END AS lang_guess,
          round(
            (CASE WHEN n_tok >= 10 AND n_tok <= 100000 THEN 0.4 ELSE 0.0 END)
            + (CASE WHEN n_tok > 0
                     AND length(text)::DOUBLE / n_tok >= 3
                     AND length(text)::DOUBLE / n_tok <= 12 THEN 0.3 ELSE 0.0 END)
            + least(0.3, (CASE WHEN n_tok > 0
                          THEN hits_en::DOUBLE / n_tok ELSE 0.0 END) * 3), 6) AS quality,
          md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
          list_reduce(
            list_transform(
              regexp_split_to_array(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), '\s+'),
              s -> CAST(7 * length(s) + ascii(substr(s, 1, 1)) AS BIGINT)),
            (acc, v) -> (acc * 31 + v) % 1000000007) AS rfp,
          round(coalesce(r.rep_top_frac, 0.0), 6) AS rep_top_frac,
          round(coalesce(r.rep_dup_frac, 0.0), 6) AS rep_dup_frac,
          gv.g_word_count, gv.g_mean_word_len, gv.g_symbol_word_ratio,
          gv.g_bullet_line_frac, gv.g_ellipsis_line_frac,
          gv.g_alpha_word_frac, gv.g_stopword_hits, gv.gopher_keep,
          cv.c4_lines_in, cv.c4_lines_kept, cv.c4_sentences, cv.c4_keep,
          round(clf.p, 3) AS clf_prob,
          (clf.p >= 0.5) AS clf_keep,
          lm.avg_logprob
        FROM h
        JOIN gverd gv ON gv.doc_id = h.doc_id
        JOIN c4v cv ON cv.doc_id = h.doc_id
        -- LEFT: the clf VALUES are recomputed for the gate corpus
        -- (oracle_sf_dir); at any other SF the sf1 fold check EXCLUDEs
        -- the clf columns, and an inner join would truncate the rows
        LEFT JOIN clf ON clf.doc_id = h.doc_id
        LEFT JOIN (
          WITH lm_w AS (
            SELECT doc_id,
                   UNNEST(regexp_split_to_array(trim(text), '\s+')) AS w
            FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
          ),
          lm_v AS (SELECT w, count(*) AS cnt FROM lm_w GROUP BY w),
          lm_s AS (SELECT sum(cnt) AS n, count(*) AS v FROM lm_v),
          -- count-weighted formulation, SAME summation shape as the
          -- Spark side (sum(cnt*lp)/sum(cnt) over distinct tokens):
          -- a per-instance avg() would sum in a different float order
          -- and could flip the 6-decimal round at a boundary
          lm_e AS (SELECT doc_id, w, count(*) AS tcnt
                   FROM lm_w GROUP BY doc_id, w)
          SELECT e.doc_id,
                 round(sum(e.tcnt * ln((v.cnt + 1.0) / (s.n + s.v + 1.0)))
                       / sum(e.tcnt), 6) AS avg_logprob
          FROM lm_e e JOIN lm_v v USING (w), lm_s s
          GROUP BY e.doc_id
        ) lm ON lm.doc_id = h.doc_id
        LEFT JOIN (
          WITH toks2 AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
            FROM documents
          ),
          g AS (
            SELECT doc_id, array_to_string(list_slice(w, i, i + 1), ' ') AS g
            FROM toks2, UNNEST(generate_series(1, len(w) - 1)) AS u(i)
          ),
          c AS (SELECT doc_id, g, count(*) AS cnt FROM g GROUP BY 1, 2),
          p AS (
            SELECT doc_id, sum(cnt) AS total, max(cnt) AS top,
                   sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup
            FROM c GROUP BY 1
          )
          SELECT doc_id,
                 top::DOUBLE / total AS rep_top_frac,
                 dup::DOUBLE / total AS rep_dup_frac
          FROM p WHERE total > 0
        ) r ON r.doc_id = h.doc_id
    """

    # llm_prep: planted dups have higher ids → dedup keeps the originals,
    # and a dup's original passes the same gates (same text), so the
    # prep leg is documents filtered on quality+language, grouped by
    # source. Round 11 adds the chunk / qf / sample legs (closed-form
    # chunk boundaries, Gopher repetition fractions, md5-bucket ranked
    # sampling — the same bucket expression curation_split's oracle uses).
    sql["llm_prep_pipeline"] = rf"""
        WITH t AS (
          SELECT doc_id, source, text,
            regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
            regexp_split_to_array(trim(text), '\s+') AS rtoks,
            CASE WHEN trim(text) = '' THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok
          FROM documents
        ),
        h AS (
          SELECT doc_id, source, n_tok,
            len(list_filter(toks, x -> x IN ({en}))) AS hits_en,
            len(list_filter(toks, x -> x IN ({de}))) AS hits_de,
            len(list_filter(toks, x -> x IN ({fr}))) AS hits_fr,
            len(list_filter(toks, x -> x IN ({es}))) AS hits_es,
            length(text) AS n_chars
          FROM t
        ),
        scored AS (
          SELECT doc_id, source, n_tok,
            round(
              (CASE WHEN n_tok >= 10 AND n_tok <= 100000 THEN 0.4 ELSE 0.0 END)
              + (CASE WHEN n_tok > 0 AND n_chars::DOUBLE / n_tok >= 3
                       AND n_chars::DOUBLE / n_tok <= 12 THEN 0.3 ELSE 0.0 END)
              + least(0.3, (CASE WHEN n_tok > 0
                            THEN hits_en::DOUBLE / n_tok ELSE 0.0 END) * 3), 6) AS q,
            CASE
              WHEN hits_en > 0 AND hits_en >= hits_de AND hits_en >= hits_fr
                   AND hits_en >= hits_es THEN 'en'
              WHEN hits_de > 0 AND hits_de >= hits_en AND hits_de >= hits_fr
                   AND hits_de >= hits_es THEN 'de'
              WHEN hits_fr > 0 AND hits_fr >= hits_en AND hits_fr >= hits_de
                   AND hits_fr >= hits_es THEN 'fr'
              WHEN hits_es > 0 AND hits_es >= hits_en AND hits_es >= hits_de
                   AND hits_es >= hits_fr THEN 'es'
              ELSE 'unknown' END AS lang
          FROM h
        ),
        -- chunk leg: chunk_documents(max_tokens=32, overlap=8) =>
        -- stride 24; chunk i = tokens [i*24+1, i*24+32] (1-based)
        ch AS (
          SELECT doc_id,
            unnest(range(CAST(greatest(1, ceil((n_tok - 8) / 24.0)) AS INT)))
              AS chunk_id,
            rtoks
          FROM t WHERE n_tok > 0
        ),
        chx AS (
          SELECT chunk_id,
            list_slice(rtoks, chunk_id * 24 + 1, chunk_id * 24 + 32) AS chunk
          FROM ch
        ),
        -- qf leg: Gopher bigram repetition over ORIGINAL-case tokens
        g AS (
          SELECT doc_id, array_to_string(list_slice(rtoks, i, i + 1), ' ') AS gm
          FROM t, UNNEST(generate_series(1, len(rtoks) - 1)) AS u(i)
        ),
        gc AS (SELECT doc_id, gm, count(*) AS cnt FROM g GROUP BY 1, 2),
        rep AS (
          SELECT doc_id, sum(cnt) AS total, max(cnt) AS top,
                 sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup
          FROM gc GROUP BY 1
        ),
        qf AS (
          SELECT s.doc_id, s.q, s.n_tok,
                 COALESCE(r.top::DOUBLE / r.total, 0.0) AS rep_top,
                 COALESCE(r.dup::DOUBLE / r.total, 0.0) AS rep_dup
          FROM scored s
          LEFT JOIN rep r ON r.doc_id = s.doc_id AND r.total > 0
        ),
        -- sample leg: split_bucket(seed=0, key=doc_id) ranking, 10/group
        sb AS (
          SELECT doc_id, source,
            ('0x' || substr(md5('0' || chr(31) || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              % 1000000 AS bkt
          FROM documents
        ),
        sr AS (
          SELECT doc_id, source,
            row_number() OVER (PARTITION BY source ORDER BY bkt, doc_id) AS rk
          FROM sb
        )
        SELECT 'prep' AS op, source AS k, count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens,
               round(avg(q), 6) AS avg_quality, 0.0 AS x
        FROM scored WHERE q >= 0.5 AND lang = 'en'
        GROUP BY source
        UNION ALL
        SELECT 'chunk' AS op, CAST(chunk_id AS VARCHAR) AS k,
               count(*) AS n_docs,
               CAST(sum(len(chunk)) AS BIGINT) AS total_tokens,
               round(avg(length(array_to_string(chunk, ' '))), 6) AS avg_quality,
               round(avg(len(chunk)), 6) AS x
        FROM chx GROUP BY chunk_id
        UNION ALL
        SELECT 'qf' AS op,
               CAST((q >= 0.5 AND rep_top <= 0.3 AND rep_dup <= 0.5)
                    AS VARCHAR) AS k,
               count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens,
               round(avg(q), 6) AS avg_quality,
               round(avg(rep_top) + avg(rep_dup), 6) AS x
        FROM qf GROUP BY 1, 2
        UNION ALL
        SELECT 'sample' AS op, source AS k, count(*) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS total_tokens,
               0.0 AS avg_quality, 0.0 AS x
        FROM sr WHERE rk <= 10 GROUP BY source
    """

    # The corpus is pure ASCII (verified: octet_length(encode(text)) ==
    # length(text) for every row), so the byte histogram is a character
    # histogram; features compared as integer bucket counts (q_mm_suite).
    sql["mm_suite"] = """
        WITH meta AS (
          SELECT 'meta' AS op, doc_id, CAST(0 AS BIGINT) AS k,
                 CAST(octet_length(encode(text)) AS BIGINT) AS n,
                 substr(text, 1, 8) AS s
          FROM documents
        ),
        chars AS (
          SELECT doc_id, ascii(substr(text, i, 1)) % 8 AS b
          FROM documents, UNNEST(generate_series(1, length(text))) AS u(i)
        ),
        h AS (SELECT doc_id, b, count(*) AS cnt FROM chars GROUP BY 1, 2),
        d AS (SELECT doc_id, octet_length(encode(text)) AS t FROM documents),
        feat AS (
          SELECT 'feat' AS op, d.doc_id, CAST(g.i AS BIGINT) AS k,
                 CAST(coalesce(h.cnt, 0) AS BIGINT) AS n, '' AS s
          FROM d
          CROSS JOIN UNNEST(generate_series(0, 7)) AS g(i)
          LEFT JOIN h ON h.doc_id = d.doc_id AND h.b = g.i
        ),
        b AS (SELECT doc_id, encode(text) AS payload FROM documents),
        fr AS (
          SELECT doc_id, hex(payload) AS ph,
                 CAST(floor((octet_length(payload) + 15) / 16) AS BIGINT) AS n_frames
          FROM b
        ),
        frame AS (
          SELECT 'frame' AS op, doc_id, CAST(i AS BIGINT) AS k,
                 CAST(0 AS BIGINT) AS n,
                 substr(ph, CAST(1 + i * 32 AS BIGINT), 32) AS s
          FROM fr, UNNEST(generate_series(0, n_frames - 1, 4)) AS u(i)
        ),
        -- real-decode leg: recompute the deterministic BMP/WAV/PNG
        -- payload constructions arithmetically (decoded-scalar sum +
        -- count); matching k proves the Spark side really encoded AND
        -- decoded the container (raw byte sums include header/padding/
        -- DEFLATE bytes and differ). Round 10: doc_id mod 8 rotates
        -- every supported container variant through the oracle —
        -- grayscale / gray+alpha / palette+tRNS / 16-bit Adam7 PNG
        media AS (
          SELECT 'media' AS op, d.doc_id,
                 CAST(sum((d.doc_id + u.j) % 256) AS BIGINT) AS k,
                 CAST(96 AS BIGINT) AS n, 'bmp:8x4@0' AS s
          FROM documents d, UNNEST(generate_series(0, 95)) AS u(j)
          WHERE d.doc_id % 8 = 0 GROUP BY d.doc_id
          UNION ALL
          SELECT 'media' AS op, d.doc_id,
                 CAST(sum(((d.doc_id * 7 + u.j * 13) % 65536) - 32768) AS BIGINT) AS k,
                 CAST(32 AS BIGINT) AS n, 'wav:0x0@8000' AS s
          FROM documents d, UNNEST(generate_series(0, 31)) AS u(j)
          WHERE d.doc_id % 8 = 1 GROUP BY d.doc_id
          UNION ALL
          SELECT 'media' AS op, d.doc_id,
                 CAST(sum((d.doc_id + u.j) % 256) AS BIGINT) AS k,
                 CAST(96 AS BIGINT) AS n, 'png:6x4@0' AS s
          FROM documents d, UNNEST(generate_series(0, 95)) AS u(j)
          WHERE d.doc_id % 8 = 2 GROUP BY d.doc_id
          UNION ALL
          SELECT 'media' AS op, d.doc_id,
                 CAST(sum((d.doc_id + u.j) % 256) AS BIGINT) AS k,
                 CAST(24 AS BIGINT) AS n, 'png:8x3@0' AS s
          FROM documents d, UNNEST(generate_series(0, 23)) AS u(j)
          WHERE d.doc_id % 8 = 3 GROUP BY d.doc_id
          UNION ALL
          SELECT 'media' AS op, d.doc_id,
                 CAST(sum((d.doc_id + u.j) % 256) AS BIGINT) AS k,
                 CAST(40 AS BIGINT) AS n, 'png:5x4@0' AS s
          FROM documents d, UNNEST(generate_series(0, 39)) AS u(j)
          WHERE d.doc_id % 8 = 4 GROUP BY d.doc_id
          UNION ALL
          -- palette lookup: per-index RGBA scalar totals
          -- idx0=(255,0,0,a10)=265  idx1=(0,255,0,a20)=275
          -- idx2=(0,0,255,a255)=510 idx3=(7,8,9,a255)=279
          SELECT 'media' AS op, d.doc_id,
                 CAST(sum(CASE (d.doc_id + u.j) % 4
                          WHEN 0 THEN 265 WHEN 1 THEN 275
                          WHEN 2 THEN 510 ELSE 279 END) AS BIGINT) AS k,
                 CAST(100 AS BIGINT) AS n, 'png:5x5@0' AS s
          FROM documents d, UNNEST(generate_series(0, 24)) AS u(j)
          WHERE d.doc_id % 8 = 5 GROUP BY d.doc_id
          UNION ALL
          SELECT 'media' AS op, d.doc_id,
                 CAST(sum((d.doc_id * 3 + u.j * 257) % 65536) AS BIGINT) AS k,
                 CAST(16 AS BIGINT) AS n, 'png:4x4@0' AS s
          FROM documents d, UNNEST(generate_series(0, 15)) AS u(j)
          WHERE d.doc_id % 8 = 6 GROUP BY d.doc_id
          UNION ALL
          -- v7: three-frame GIF — lossless LZW, so the decoded sum over
          -- ALL frames is the palette CASE-sum (RGB totals 255/255/255/24)
          SELECT 'media' AS op, d.doc_id,
                 CAST(sum(CASE (d.doc_id + ff.i * 16 + u.j) % 4
                          WHEN 0 THEN 255 WHEN 1 THEN 255
                          WHEN 2 THEN 255 ELSE 24 END) AS BIGINT) AS k,
                 CAST(144 AS BIGINT) AS n, 'gif:4x4@0' AS s
          FROM documents d, UNNEST(generate_series(0, 2)) AS ff(i),
               UNNEST(generate_series(0, 15)) AS u(j)
          WHERE d.doc_id % 8 = 7 GROUP BY d.doc_id
        ),
        -- resize leg (r10): 4x4 NEAREST resize of every image variant,
        -- recomputed closed-form: src index = floor((out+0.5)*src/4).
        -- Matching k proves decode -> resize kernel -> PNG re-encode ->
        -- second decode all ran correctly.
        g4 AS (SELECT * FROM UNNEST(generate_series(0, 3)) AS t(i)),
        rz AS (
          -- v0: BMP 4x8x3 -> sy=i, sx=2*jx+1
          SELECT 'resize' AS op, d.doc_id,
                 CAST(sum((d.doc_id + yy.i * 24 + (2 * xx.i + 1) * 3 + cc.i) % 256)
                      AS BIGINT) AS k,
                 CAST(48 AS BIGINT) AS n, 'png:4x4@0' AS s
          FROM documents d, g4 yy, g4 xx,
               UNNEST(generate_series(0, 2)) AS cc(i)
          WHERE d.doc_id % 8 = 0 GROUP BY d.doc_id
          UNION ALL
          -- v2: RGBA PNG 4x6x4 -> sy=i, sx=floor((jx+0.5)*1.5)
          SELECT 'resize' AS op, d.doc_id,
                 CAST(sum((d.doc_id + yy.i * 24
                           + CAST(floor((xx.i + 0.5) * 1.5) AS BIGINT) * 4
                           + cc.i) % 256) AS BIGINT) AS k,
                 CAST(64 AS BIGINT) AS n, 'png:4x4@0' AS s
          FROM documents d, g4 yy, g4 xx,
               UNNEST(generate_series(0, 3)) AS cc(i)
          WHERE d.doc_id % 8 = 2 GROUP BY d.doc_id
          UNION ALL
          -- v3: gray 3x8 -> sy=floor((i+0.5)*0.75), sx=2*jx+1
          SELECT 'resize' AS op, d.doc_id,
                 CAST(sum((d.doc_id
                           + CAST(floor((yy.i + 0.5) * 0.75) AS BIGINT) * 8
                           + 2 * xx.i + 1) % 256) AS BIGINT) AS k,
                 CAST(16 AS BIGINT) AS n, 'png:4x4@0' AS s
          FROM documents d, g4 yy, g4 xx
          WHERE d.doc_id % 8 = 3 GROUP BY d.doc_id
          UNION ALL
          -- v4: gray+alpha 4x5x2 -> sy=i, sx=floor((jx+0.5)*1.25)
          SELECT 'resize' AS op, d.doc_id,
                 CAST(sum((d.doc_id + yy.i * 10
                           + CAST(floor((xx.i + 0.5) * 1.25) AS BIGINT) * 2
                           + cc.i) % 256) AS BIGINT) AS k,
                 CAST(32 AS BIGINT) AS n, 'png:4x4@0' AS s
          FROM documents d, g4 yy, g4 xx,
               UNNEST(generate_series(0, 1)) AS cc(i)
          WHERE d.doc_id % 8 = 4 GROUP BY d.doc_id
          UNION ALL
          -- v5: palette 5x5 -> RGBA; sy=sx=floor((t+0.5)*1.25);
          -- per-index RGBA totals as in the media leg
          SELECT 'resize' AS op, d.doc_id,
                 CAST(sum(CASE (d.doc_id
                                + CAST(floor((yy.i + 0.5) * 1.25) AS BIGINT) * 5
                                + CAST(floor((xx.i + 0.5) * 1.25) AS BIGINT)) % 4
                          WHEN 0 THEN 265 WHEN 1 THEN 275
                          WHEN 2 THEN 510 ELSE 279 END) AS BIGINT) AS k,
                 CAST(64 AS BIGINT) AS n, 'png:4x4@0' AS s
          FROM documents d, g4 yy, g4 xx
          WHERE d.doc_id % 8 = 5 GROUP BY d.doc_id
          UNION ALL
          -- v6: 16-bit gray 4x4 -> identity resize, uint16 preserved
          SELECT 'resize' AS op, d.doc_id,
                 CAST(sum((d.doc_id * 3 + u.j * 257) % 65536) AS BIGINT) AS k,
                 CAST(16 AS BIGINT) AS n, 'png:4x4@0' AS s
          FROM documents d, UNNEST(generate_series(0, 15)) AS u(j)
          WHERE d.doc_id % 8 = 6 GROUP BY d.doc_id
          UNION ALL
          -- v7: GIF -> resize uses frame 0 (identity 4x4), RGB lookup
          SELECT 'resize' AS op, d.doc_id,
                 CAST(sum(CASE (d.doc_id + u.j) % 4
                          WHEN 0 THEN 255 WHEN 1 THEN 255
                          WHEN 2 THEN 255 ELSE 24 END) AS BIGINT) AS k,
                 CAST(48 AS BIGINT) AS n, 'png:4x4@0' AS s
          FROM documents d, UNNEST(generate_series(0, 15)) AS u(j)
          WHERE d.doc_id % 8 = 7 GROUP BY d.doc_id
        ),
        -- vframes (r10): every 2nd frame of the 3-frame GIFs (f = 0, 2),
        -- per-frame pixel sums — real frame extraction, oracle-checked
        vframes AS (
          SELECT 'vframes' AS op, d.doc_id,
                 CAST(sum(CASE (d.doc_id + ff.i * 16 + u.j) % 4
                          WHEN 0 THEN 255 WHEN 1 THEN 255
                          WHEN 2 THEN 255 ELSE 24 END) AS BIGINT) AS k,
                 CAST(48 AS BIGINT) AS n,
                 'f' || CAST(ff.i AS VARCHAR) AS s
          FROM documents d, UNNEST(generate_series(0, 2, 2)) AS ff(i),
               UNNEST(generate_series(0, 15)) AS u(j)
          WHERE d.doc_id % 8 = 7 GROUP BY d.doc_id, ff.i
        )
        SELECT * FROM meta UNION ALL SELECT * FROM feat
        UNION ALL SELECT * FROM frame UNION ALL SELECT * FROM media
        UNION ALL SELECT * FROM rz UNION ALL SELECT * FROM vframes
    """

    sql["stream_dedup_profile"] = """
        SELECT 'dedup' AS op, CAST(event_id AS VARCHAR) AS k, event_type AS s,
          CAST(0 AS BIGINT) AS n1, CAST(0 AS BIGINT) AS n2,
          round(value, 2) AS v1, 0.0 AS v2, 0.0 AS v3
        FROM events
        UNION ALL
        SELECT 'profile' AS op,
          strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS k, '' AS s,
          count(*) AS n1, CAST(0 AS BIGINT) AS n2,
          round(min(value), 2) AS v1, round(max(value), 2) AS v2,
          round(avg(value), 4) AS v3
        FROM events GROUP BY 1, 2, 3
    """

    # md5 bucket identical in both engines: Spark conv(substring(md5(k),
    # 1, 8), 16, 10) == DuckDB ('0x' || substr(md5(k), 1, 8))::UBIGINT;
    # key = seed || chr(31) || value (curation.split_bucket).
    sql["curation_split"] = """
        WITH sp AS (
          SELECT doc_id,
            ('0x' || substr(md5('42' || chr(31) || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              % 1000000 AS bkt
          FROM documents
        ),
        sm AS (
          SELECT doc_id, lang,
            ('0x' || substr(md5('7' || chr(31) || source), 1, 8))::UBIGINT
              % 1000000 AS bkt
          FROM documents
        )
        SELECT 'split' AS op, doc_id,
          CASE WHEN bkt < 900000 THEN 'train'
               WHEN bkt < 950000 THEN 'val'
               ELSE 'test' END AS label
        FROM sp
        UNION ALL
        SELECT 'sample' AS op, doc_id, lang AS label
        FROM sm
        WHERE bkt < CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 250000
                              WHEN 'fr' THEN 1000000 ELSE 0 END
        UNION ALL
        SELECT 'zorder' AS op, doc_id, lang AS label FROM documents
        UNION ALL
        SELECT 'zorder_pruned' AS op, doc_id, lang AS label FROM documents
        WHERE n_chars < 200 AND lang = 'en'
    """ + _dsir_oracle_legs()

    sql["curation_contamination"] = """
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
        ),
        grams AS (
          SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + 4), ' ') AS g
          FROM toks, UNNEST(generate_series(1, len(w) - 4)) AS u(i)
        ),
        ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
        corpus AS (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0),
        hits AS (
          SELECT gr.doc_id,
            count(*) AS n_grams,
            CAST(sum(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
          FROM grams gr LEFT JOIN ev ON gr.g = ev.g
          WHERE gr.doc_id % 97 <> 0
          GROUP BY gr.doc_id
        )
        SELECT c.doc_id, CAST(coalesce(h.n_grams, 0) AS BIGINT) AS n_grams,
               CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
               CAST(CASE WHEN coalesce(h.n_hits, 0) > 0 THEN 1 ELSE 0 END AS INTEGER)
                 AS contaminated
        FROM corpus c LEFT JOIN hits h ON h.doc_id = c.doc_id
    """

    sql["curation_pack"] = """
        WITH t AS (
          SELECT doc_id,
            CASE WHEN trim(text) = '' THEN 0
                 ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
          FROM documents
        ),
        c AS (
          SELECT doc_id, n_tokens,
            CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
              AS start_offset
          FROM t
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, start_offset,
               start_offset // 512 AS pack_id
        FROM c
    """

    sql["join_enrich"] = """
        SELECT r_name, count(*) AS n_customers,
               round(avg(c_acctbal), 4) AS avg_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """

    sql["boundary_scrub"] = f"""
        WITH t AS ({LI_SQL})
        SELECT l_orderkey, l_linenumber,
          round(coalesce(qty,  (SELECT quantile_cont(qty, 0.5) FROM t)), 4) AS qty,
          round(coalesce(price,(SELECT quantile_cont(price, 0.5) FROM t)), 4) AS price,
          coalesce(flag, '') AS flag
        FROM t
    """

    # NOTE: the null injection collapses some lineitem rows into identical
    # tuples, so the pipeline's dedup stage (keep-first) = DISTINCT here;
    # outlier/scale statistics are computed on the DEDUPED set, as in the
    # pipeline's canonical order.
    # gaps-and-islands oracle for the stateful sessionizer (30-min gap);
    # timestamps truncated to micros on the Spark side, so compare at
    # second precision via strftime
    # Tagged union of the two sessionizers. Native session_window
    # semantics differ from the stateful operator in two pinned ways: a
    # quiet period of EXACTLY the gap starts a new session (strict <,
    # hence >= in brk), and the emitted end is exclusive (last event +
    # gap).
    sql["stream_sessionize"] = """
        WITH g AS (
          SELECT user_id, ts,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS brk,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS brk_n
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (
          SELECT user_id, ts,
            CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_id,
            CAST(sum(brk_n) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_id_n
          FROM g
        )
        SELECT 'stateful' AS variant, user_id, session_id,
          count(*) AS n_events,
          strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
          strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS s_end
        FROM s GROUP BY user_id, session_id
        UNION ALL
        SELECT 'native' AS variant, user_id, session_id_n AS session_id,
          count(*) AS n_events,
          strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
          strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS s_end
        FROM s GROUP BY user_id, session_id_n
    """

    # Sliding windows in plain SQL: each event belongs to window starts
    # {30-min-grid-floor(ts) - k*30min : k in 0..1} for the 1h/30min
    # window/slide pair (window start is naive-UTC epoch-aligned, same
    # as Spark's window() on a UTC session).
    sql["stream_window_agg"] = """
        WITH wins AS (
          SELECT event_type, value,
            make_timestamp((CAST(floor(epoch(ts)/1800) AS BIGINT)*1800
                            - k*1800) * 1000000) AS w_start
          FROM events, UNNEST([0, 1]) AS u(k)
        )
        SELECT 'wagg' AS op,
          strftime(w_start, '%Y-%m-%d %H:%M:%S') AS s,
          event_type AS k, count(*) AS n,
          round(sum(value), 4) AS v
        FROM wins GROUP BY 1, 2, 3
        UNION ALL
        -- r10 sjoin leg: batch recomputation of the watermarked
        -- stream-stream interval join (inner, same user, click within
        -- [imp_ts, imp_ts + 30 min]), summarized per user
        SELECT 'sjoin' AS op, '' AS s,
          CAST(i.user_id AS VARCHAR) AS k, count(*) AS n,
          round(sum(c.value), 4) AS v
        FROM (SELECT user_id, ts FROM events WHERE event_id % 10 = 0) i
        JOIN (SELECT user_id, ts, value FROM events WHERE event_id % 10 = 5) c
          ON c.user_id = i.user_id
         AND c.ts >= i.ts AND c.ts <= i.ts + INTERVAL 30 MINUTE
        GROUP BY i.user_id
    """

    # Deterministic model output (seeded RNG + sorted fit values → the
    # flagged set is a pure function of the value multiset): kept-row
    # count and kept-id checksum RECOMPUTED from the DuckDB-fetched column
    # at oracle-construction time (tools/oracle_recompute.py — same seeded
    # numpy forest, independent scoring/threshold/removal/checksum path) —
    # replaces round 5's pinned literals.
    sql["o4_isolation_forest"] = _iforest_oracle()

    sql["pipeline_e2e"] = f"""
        WITH t AS ({LI_SQL}),
        filled0 AS (
          SELECT l_orderkey, l_linenumber,
            coalesce(qty,  (SELECT quantile_cont(qty, 0.5) FROM t)) AS qty,
            coalesce(price,(SELECT quantile_cont(price, 0.5) FROM t)) AS price,
            coalesce(flag, {mode.format(c='flag')}) AS flag
          FROM t
        ),
        filled AS (SELECT DISTINCT * FROM filled0),
        b AS (SELECT quantile_cont(price, 0.25) AS q1,
                     quantile_cont(price, 0.75) AS q3 FROM filled),
        capped AS (
          SELECT l_orderkey, l_linenumber, qty,
            CASE WHEN (q3 - q1) = 0 THEN price
                 WHEN price < q1 - 1.5 * (q3 - q1) THEN q1 - 1.5 * (q3 - q1)
                 WHEN price > q3 + 1.5 * (q3 - q1) THEN q3 + 1.5 * (q3 - q1)
                 ELSE price END AS price, flag
          FROM filled, b
        ),
        mm AS (SELECT min(qty) AS lo, max(qty) AS hi FROM capped)
        SELECT l_orderkey, l_linenumber,
          round((qty - lo) / (hi - lo) * 1.0 + 0.0, 6) AS qty,
          round(price, 4) AS price, flag
        FROM capped, mm
    """

    return sql
