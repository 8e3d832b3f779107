"""Pipeline report parity: per-op changed-cell counts and `updates` lines
(reference report shape, /root/reference/methods/textCleaning.py:76,147-148
and methods/duplicate.py:50-59), opt-in under collect_metrics."""

from pyspark.sql import functions as F

from dataforge_spark.io import ROW_ID
from dataforge_spark.pipeline import CleaningPipeline, cells_changed


def _golden(spark):
    rows = [
        (0, "  Hello World  ", 1.0),
        (1, "teh cat", 2.0),
        (2, "clean", None),
        (3, "clean", 4.0),
        (4, "clean", 4.0),
    ]
    return spark.createDataFrame(rows, f"{ROW_ID} long, txt string, x double")


def test_cells_changed_counts_and_updates(spark):
    df = _golden(spark)
    pipe = CleaningPipeline(collect_metrics=True)
    out, report = pipe.run(
        df,
        {
            "text_cleaning": {
                "enabled": True,
                "columns": ["txt"],
                "operations": ["lowercase", "remove_extra_spaces"],
            },
            "missing_values": {
                "enabled": True,
                "strategy": "fill_mean",
                "columns": ["x"],
            },
        },
    )
    tc = report["operations"]["text_cleaning"]
    # rows 0 ("  Hello World  ") and 1 (unchanged by lowercase? no: already
    # lower) — row 0 changes (case + spaces); rows with 'teh cat'/'clean'
    # are already lowercase and space-clean.
    assert tc["cells_changed"] == {"txt": 1}
    assert tc["updates"] == ["Column 'txt': Made 1 changes"]
    mv = report["operations"]["missing_values"]
    assert mv["cells_changed"] == {"x": 1}  # the NULL fill
    assert mv["rows_before"] == 5 and mv["rows_after"] == 5
    assert out.count() == 5


def test_duplicate_count_reported(spark):
    df = _golden(spark).drop("txt")
    pipe = CleaningPipeline(collect_metrics=True)
    _, report = pipe.run(
        df, {"duplicates": {"enabled": True, "subset": ["x"]}}
    )
    dup = report["operations"]["duplicates"]
    # x values: 1.0, 2.0, NULL, 4.0, 4.0 → one duplicate row dropped
    assert dup["duplicate_count"] == 1
    assert dup["rows_before"] == 5 and dup["rows_after"] == 4
    # surviving rows are unmodified
    assert dup["cells_changed"] == {}


def test_cells_changed_without_row_id_is_empty(spark):
    a = spark.createDataFrame([(1,)], "v long")
    b = a.withColumn("v", F.col("v") + 1)
    assert cells_changed(a, b) == {}


def test_metrics_off_adds_no_jobs_keys(spark):
    df = _golden(spark)
    _, report = CleaningPipeline().run(
        df, {"duplicates": {"enabled": True}}
    )
    assert "cells_changed" not in report["operations"]["duplicates"]


def test_auto_persist_policy_counts_downstream_stat_ops():
    """_runs_stat_jobs classifies which ops re-scan their input with
    driver-side statistics jobs — the auto-persist policy's input."""
    from dataforge_spark.pipeline import CleaningPipeline

    f = CleaningPipeline._runs_stat_jobs
    assert not f("text_cleaning", {})
    assert not f("duplicates", {})
    assert not f("missing_values", {"strategy": "drop_rows"})
    assert f("missing_values", {"strategy": "fill_median"})
    assert f("missing_values", {})  # default fill_mean
    assert not f("typo_fix", {})  # default common_typos is a regexp chain
    assert f("typo_fix", {"method": "fuzzy_match"})
    assert f("data_type_conversion", {})  # auto_detect default True
    assert not f("data_type_conversion", {"auto_detect": False})
    assert f("data_type_conversion", {"auto_detect": False, "errors": "raise"})
    assert f("outliers", {}) and f("normalization", {}) and f("encoding", {})


def test_run_logging_writes_per_op_lines(spark, tmp_path):
    """Reference parity (/root/reference/pipeline.py:38-45): with the
    opt-in handler attached, a pipeline run appends op-start / op-result
    lines to a persistent log file; an op failure logs an error line."""
    from pyspark.sql import functions as F

    from dataforge_spark.pipeline import (
        CleaningPipeline,
        disable_run_logging,
        enable_run_logging,
    )

    log = tmp_path / "pipeline_log.txt"
    h = enable_run_logging(str(log))
    try:
        df = spark.createDataFrame(
            [(1, 4.0), (2, None), (2, None)], "k int, v double"
        )
        CleaningPipeline().run(
            df,
            {
                "missing_values": {"enabled": True, "strategy": "fill_mean"},
                "duplicates": {"enabled": True},
            },
        )[0].count()
        # error isolation still logs: unknown strategy inside an op body
        out, rep = CleaningPipeline().run(
            df, {"outliers": {"enabled": True, "method": "iqr",
                              "action": "cap", "columns": ["missing_col"]}},
        )
    finally:
        disable_run_logging(h)
    text = log.read_text()
    assert "Starting pipeline run" in text
    assert "Running missing_values operation..." in text
    assert "missing_values operation completed successfully" in text
    assert "Running duplicates operation..." in text
    assert "Pipeline completed in" in text
    # handler detached: a further run must not append
    size = log.stat().st_size
    CleaningPipeline().run(df, {"duplicates": {"enabled": True}})
    assert log.stat().st_size == size
