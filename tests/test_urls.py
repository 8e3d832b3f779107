"""URL canonicalization tests — all pure-expression (plan audited:
no UDF), covering scheme/host/port/path/query/fragment rules."""

import pytest
from pyspark.sql import functions as F

from dataforge_spark.functions.urls import (
    canonicalize_url,
    url_domain,
    url_host,
)


@pytest.fixture(scope="module")
def canon(spark):
    def run(*urls):
        df = spark.createDataFrame([(u,) for u in urls], "u string")
        return [
            r["c"] for r in df.select(canonicalize_url("u").alias("c")).collect()
        ]

    return run


def test_case_port_www_fragment(canon):
    assert canon(
        "HTTP://WWW.Example.COM:80/Path/?b=2&a=1#frag",
        "https://example.com:443/x",
        "https://example.com:8443/x",
    ) == [
        "http://example.com/Path?a=1&b=2",
        "https://example.com/x",
        "https://example.com:8443/x",
    ]


def test_trailing_slash_and_empty_path(canon):
    a, b, c, d = canon(
        "http://a.com", "http://a.com/", "http://a.com/p/", "http://a.com/p"
    )
    assert a == b == "http://a.com"
    assert c == d == "http://a.com/p"


def test_tracking_params_dropped_and_sorted(canon):
    (got,) = canon(
        "https://s.io/p?utm_source=x&z=1&utm_campaign=c&a=2&fbclid=F&gclid=G"
    )
    assert got == "https://s.io/p?a=2&z=1"
    # all params tracking → no query part at all
    (got2,) = canon("https://s.io/p?utm_source=x")
    assert got2 == "https://s.io/p"


def test_equivalent_spellings_collapse(canon):
    urls = [
        "http://www.shop.example.com/item?id=9&utm_medium=m",
        "HTTP://SHOP.EXAMPLE.COM:80/item/?id=9",
        "http://shop.example.com/item?id=9#reviews",
    ]
    got = canon(*urls)
    assert len(set(got)) == 1


def test_unparseable_is_null(canon):
    assert canon("not a url", "") == [None, None]


def test_host_and_domain(spark):
    df = spark.createDataFrame(
        [
            ("https://www.News.Example.CO.UK:443/a",),
            ("http://sub.deep.example.com/b",),
            ("http://localhost/x",),
        ],
        "u string",
    )
    rows = df.select(
        url_host("u").alias("h"), url_domain("u").alias("d")
    ).collect()
    assert [r["h"] for r in rows] == [
        "news.example.co.uk", "sub.deep.example.com", "localhost",
    ]
    assert [r["d"] for r in rows] == [
        "example.co.uk", "example.com", "localhost",
    ]


def test_pure_expressions_no_udf(spark):
    df = spark.createDataFrame([("http://x.com/a?b=1",)], "u string")
    plan = (
        df.select(canonicalize_url("u").alias("c"), url_domain("u").alias("d"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
