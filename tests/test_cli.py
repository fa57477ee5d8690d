"""SQL console surface (SURVEY §2.7 L2 head/preview; reference §3.3
ad-hoc SQL): `-e` statements print a bounded preview via .show(limit),
errors surface as one-line messages with a nonzero exit code."""

from __future__ import annotations

from data_iceberg_sandbox_spark.cli import main
from tests.conftest import SF_SMOKE


def test_execute_preview_respects_limit(spark, capsys):
    rc = main(
        [
            "--sf-dir", SF_SMOKE,
            "--limit", "2",
            "-e", "SELECT r_regionkey FROM region ORDER BY r_regionkey",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "r_regionkey" in out
    # L2 head semantics: 5-row region previews only 2 rows + truncation note
    assert "|0" in out.replace(" ", "") and "|2" not in out.replace(" ", "")
    assert "only showing top 2 rows" in out


def test_bad_sql_is_one_line_error_and_nonzero_exit(spark, capsys):
    rc = main(["--sf-dir", SF_SMOKE, "-e", "SELECT FROM nowhere"])
    err = capsys.readouterr().err
    assert rc == 1
    # Spark's SQLQueryContextLogger may emit its own log line first; the
    # console contract is OUR one-line message and no Python traceback
    assert any(ln.startswith("error:") for ln in err.splitlines())
    assert "Traceback" not in err
