"""Property-based tests (SURVEY §5.4): idempotence and shape invariants.

hypothesis generates small tables; examples kept low because each example
round-trips through a Spark job.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dataforge_spark.operators.duplicates import drop_duplicates
from dataforge_spark.operators.missing_values import fix_missing_values
from dataforge_spark.operators.text_cleaning import clean_text_columns

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.one_of(st.none(), st.floats(min_value=-100, max_value=100, allow_nan=False)),
        st.one_of(st.none(), st.sampled_from(["a", "b", " x ", ""])),
    ),
    min_size=1,
    max_size=20,
)


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_dedup_idempotent(spark, rows):
    df = spark.createDataFrame(rows, "k: int, v: double, s: string")
    once = drop_duplicates(df, keep="any")
    twice = drop_duplicates(once, keep="any")
    assert once.count() == twice.count()
    key = lambda r: tuple(repr(v) for v in r)  # noqa: E731 — None-safe sort
    assert sorted(map(tuple, once.collect()), key=key) == sorted(
        map(tuple, twice.collect()), key=key
    )


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_fill_preserves_shape_and_clears_nulls(spark, rows):
    df = spark.createDataFrame(rows, "k: int, v: double, s: string")
    out = fix_missing_values(df, "fill_mean", columns=["v"])
    assert out.count() == df.count()
    assert set(out.columns) == set(df.columns)
    if df.where(F.col("v").isNotNull()).count() > 0:
        assert out.where(F.col("v").isNull()).count() == 0


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_drop_rows_never_increases(spark, rows):
    df = spark.createDataFrame(rows, "k: int, v: double, s: string")
    out = fix_missing_values(df, "drop_rows", columns=["v", "s"])
    assert out.count() <= df.count()
    assert out.where(F.col("v").isNull() | F.col("s").isNull()).count() == 0


@given(
    texts=st.lists(
        st.text(alphabet=" aB.!3\t", min_size=0, max_size=12), min_size=1, max_size=10
    )
)
@settings(**SETTINGS)
def test_text_clean_idempotent(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t: string")
    ops = ["lowercase", "remove_extra_spaces"]
    once = clean_text_columns(df, columns=["t"], operations=ops)
    twice = clean_text_columns(once, columns=["t"], operations=ops)
    assert sorted((r["t"] or "") for r in once.collect()) == sorted(
        (r["t"] or "") for r in twice.collect()
    )


@given(
    texts=st.lists(
        st.one_of(
            st.none(),
            st.sampled_from(["nan", "", "  <b>Hi</b> see http://x.io/a?b=1 ",
                             "a.b@ex.com 42 cats!", "tab\there", "ALL CAPS 99"]),
            st.text(alphabet=" aB.!3\t<>@/:#néö中", min_size=0, max_size=30),
        ),
        min_size=1, max_size=12,
    )
)
@settings(**SETTINGS)
def test_text_kernel_matches_expr(spark, texts):
    """The Arrow kernel (multi-regex-op route) must be cell-identical to
    the chained-regexp_replace expression it replaces."""
    from dataforge_spark.operators.text_cleaning import (
        clean_text_expr,
        clean_text_kernel,
    )

    ops = ["lowercase", "remove_html", "remove_urls", "remove_emails",
           "remove_numbers", "remove_punctuation", "remove_extra_spaces"]
    df = spark.createDataFrame([(t,) for t in texts], "t: string")
    both = df.select(
        clean_text_expr(F.col("t"), ops).alias("e"),
        clean_text_kernel(F.col("t"), ops).alias("k"),
    ).collect()
    for r in both:
        assert r["e"] == r["k"], (r["e"], r["k"])


@given(
    vals=st.lists(
        st.one_of(
            st.none(),
            st.from_regex(r"[0-9]{1,6}(\.[0-9]{1,4})?", fullmatch=True),
            st.from_regex(r"[0-9]{4}-[0-9]{2}-[0-9]{2}", fullmatch=True),
            st.sampled_from(["yes", "no", "TRUE", " false ", "nan", "inf",
                             "5f", "1e3", "-7", "+8.5", "abc", ""]),
            st.text(alphabet="0123456789.eE+-f na/:", min_size=0, max_size=14),
        ),
        min_size=1, max_size=25,
    )
)
@settings(**SETTINGS)
def test_detect_stats_differential(spark, vals):
    """Hypothesis differential: the Arrow detection kernel's counts must
    equal the JVM try_cast/trim/try_to_timestamp formulation on arbitrary
    numeric-ish/date-ish/bool-ish strings."""
    from dataforge_spark.operators.type_conversion import (
        _BOOL_VOCAB,
        _detect_stats,
        parse_timestamp_expr,
    )

    df = spark.createDataFrame([(v,) for v in vals], "c string")
    fmts = {"c": ["yyyy-MM-dd"]}
    got = _detect_stats(df, ["c"], fmts)
    v = F.col("c")
    num = v.try_cast("double")
    jvm = df.agg(
        F.count(v).alias("nn"),
        F.count(num).alias("num"),
        F.sum((num.isNotNull() & (num == F.floor(num))).cast("long")).alias("int"),
        F.sum(F.lower(F.trim(v)).isin(sorted(_BOOL_VOCAB)).cast("long")).alias("bool"),
        F.count(parse_timestamp_expr(v, fmts["c"])).alias("dt"),
    ).collect()[0]
    for k in ("nn", "num", "int", "bool", "dt"):
        assert got[f"{k}_c"] == (jvm[k] or 0), (k, got[f"{k}_c"], jvm[k], vals)


def test_detect_stats_datetime_out_of_pandas_range(spark):
    """Pinned r8 regression (hypothesis found '0000-01-01'): the Arrow
    kernel's datetime count must match Java's proleptic parser outside
    pandas' ns Timestamp range (1677-2262), for year 0000 (valid ISO
    leap year, unrepresentable by strptime), and still reject
    calendar-invalid shapes."""
    from pyspark.sql import functions as F

    from dataforge_spark.operators.type_conversion import (
        _detect_stats,
        parse_timestamp_expr,
    )

    cases = ["0000-01-01", "1500-01-01", "2500-06-15", "0000-02-29",
             "0000-02-30", "9999-12-31", "0001-01-01", "0000-00-00",
             "2020-13-01", "1677-09-20", "2262-04-12"]
    df = spark.createDataFrame([(v,) for v in cases], "c string")
    fmts = {"c": ["yyyy-MM-dd"]}
    got = _detect_stats(df, ["c"], fmts)
    jvm = df.agg(
        F.count(parse_timestamp_expr(F.col("c"), fmts["c"])).alias("dt")
    ).collect()[0]["dt"]
    assert got["dt_c"] == jvm == 8
