"""Blocklist matcher, unicode normalization, mojibake repair: literal
escaping, boundary semantics, plan shape, repair/no-repair cases, and
a generated mangle-then-repair property."""

import pytest
from pyspark.sql import functions as F

from dataforge_spark.functions.textfix import (
    contains_any,
    fix_mojibake,
    fix_mojibake_str,
    matches_any_word,
    normalize_unicode,
)


def test_contains_any_literals_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Buy C++ NOW"), (2, "harmless text"), (3, "lorem IPSUM here"),
         (4, None)],
        "id bigint, t string",
    )
    hits = {r["id"]: r["h"] for r in df.select(
        "id", contains_any("t", ["c++", "lorem ipsum"]).alias("h")
    ).collect()}
    # 'c++' is escaped as a literal (an unescaped regex would error or
    # match any 'c')
    assert hits[1] is True and hits[3] is True
    assert hits[2] is False
    assert hits[4] is None


def test_word_boundary_mode(spark):
    df = spark.createDataFrame(
        [(1, "my associate agrees"), (2, "you ass"), (3, "classic")],
        "id bigint, t string",
    )
    hits = {r["id"]: r["h"] for r in df.select(
        "id", matches_any_word("t", ["ass"]).alias("h")
    ).collect()}
    assert hits == {1: False, 2: True, 3: False}


def test_longest_phrase_wins_and_validation():
    from dataforge_spark.functions.textfix import _phrase_regex

    pat = _phrase_regex(["ab", "abc"], word_boundary=False)
    assert pat.index("abc") < pat.index("ab", pat.index("abc") + 3)
    with pytest.raises(ValueError):
        _phrase_regex([], word_boundary=False)


def test_blocklist_is_codegen(spark):
    df = spark.createDataFrame([("x",)], "t string")
    plan = (
        df.where(contains_any("t", ["a", "b"]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_normalize_unicode(spark):
    df = spark.createDataFrame(
        [(1, "ﬁne ｗｉｄｅ ①"), (2, None)], "id bigint, t string"
    )
    rows = {r["id"]: r["n"] for r in df.select(
        "id", normalize_unicode("t", "NFKC").alias("n")
    ).collect()}
    assert rows[1] == "fine wide 1"
    assert rows[2] is None
    with pytest.raises(ValueError):
        normalize_unicode("t", "NFX")


def test_mojibake_repairs():
    assert fix_mojibake_str("cafÃ©") == "café"
    assert fix_mojibake_str("donâ€™t stop â€” now") == "don’t stop — now"
    assert fix_mojibake_str("naÃ¯ve") == "naïve"


def test_mojibake_leaves_correct_text():
    for s in ("plain ascii", "café correct", "naïve Zürich €5",
              "русский текст", "中文文本", ""):
        assert fix_mojibake_str(s) == s


def test_mojibake_double_mangle_property():
    originals = [
        "café", "don’t — “stop”", "naïve œuvre", "Ærø señor", "€99 günstig",
    ]
    tested_once = tested_twice = 0
    for s in originals:
        # not every string mangles: CP1252 leaves five bytes undefined
        # (0x81 8D 8F 90 9D), and a UTF-8 byte landing there — e.g. the
        # closing curly quote U+201D → ...0x9D — cannot be produced by
        # a real strict CP1252 reader either
        try:
            once = s.encode("utf-8").decode("cp1252")
        except UnicodeDecodeError:
            continue
        assert fix_mojibake_str(once) == s
        tested_once += 1
        try:
            twice = once.encode("utf-8").decode("cp1252")
        except UnicodeDecodeError:
            continue
        assert fix_mojibake_str(twice) == s
        tested_twice += 1
    assert tested_once >= 3 and tested_twice >= 2


def test_mojibake_column(spark):
    df = spark.createDataFrame(
        [(1, "cafÃ©"), (2, "fine text"), (3, None)], "id bigint, t string"
    )
    rows = {r["id"]: r["f"] for r in df.select(
        "id", fix_mojibake("t").alias("f")
    ).collect()}
    assert rows == {1: "café", 2: "fine text", 3: None}


def test_strip_matching_lines(spark):
    from dataforge_spark.functions.textfix import strip_matching_lines

    text = "Real content here.\nACCEPT COOKIES now\nMore content.\nfooter (c)"
    df = spark.createDataFrame([(1, text), (2, None)], "id bigint, t string")
    rows = {r["id"]: r["s"] for r in df.select(
        "id", strip_matching_lines("t", ["accept cookies", "footer ("]).alias("s")
    ).collect()}
    assert rows[1] == "Real content here.\nMore content."
    assert rows[2] is None
    plan = (
        df.select(strip_matching_lines("t", ["x"]).alias("s"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
