"""The job-style CLI (python -m uw_hadoop_aglorithms_spark): reference
job names resolve, results write through the interchange sinks, and
unknown jobs fail with a usage hint — the switch-over surface for a
reference user (reference MapReduce/Counting/WordCount.java:126-135
takes -input/-output/-reducers; the CLI keeps that shape)."""

from __future__ import annotations

from uw_hadoop_aglorithms_spark.__main__ import ALIASES, main
from tests.conftest import SF_TEST


def test_cli_list_and_alias_resolution(spark, capsys):
    assert main(["list"]) == 0
    listed = set(capsys.readouterr().out.split())
    import __spark_entry__ as entry_mod

    assert listed == set(entry_mod.queries())
    # every alias points at a registered key
    assert set(ALIASES.values()) <= listed


def test_cli_runs_reference_job_name_to_csv(spark, tmp_path):
    out = str(tmp_path / "wc_csv")
    # reference-era class name, csv interchange output
    assert main(["WordCount", "-input", SF_TEST, "-output", out,
                 "-format", "csv"]) == 0
    import __spark_entry__ as entry_mod

    direct = entry_mod.queries()["word_count"](spark, SF_TEST)
    assert spark.read.option("header", True).csv(out).count() == direct.count()


def test_cli_rejects_unknown_job_and_missing_input(spark, capsys):
    assert main(["NoSuchJob"]) == 2
    assert "unknown job" in capsys.readouterr().err
    assert main(["word_count"]) == 2
    assert "-input" in capsys.readouterr().err
