"""Structured JSON job logging (reference glue_etl_framework.py:311-359):
one JSON line per record with the bound job fields, idempotent rebinding."""

from __future__ import annotations

import io
import json

from glue_etl_framework_spark.joblog import get_job_logger


def test_json_line_shape_and_job_fields():
    buf = io.StringIO()
    log = get_job_logger(stream=buf, pipeline="demo", type="spark-sql", output="out")
    log.info("SQL Statement : %s", "SELECT 1")
    rec = json.loads(buf.getvalue().strip())
    assert rec["message"] == "SQL Statement : SELECT 1"
    assert rec["level"] == "INFO"
    assert rec["job"] == {"pipeline": "demo", "type": "spark-sql", "output": "out"}
    for key in ("timestamp", "epoch", "file", "function", "line", "module", "name"):
        assert key in rec
    assert isinstance(rec["epoch"], float)


def test_reconfigure_rebinds_fields_single_handler():
    buf1, buf2 = io.StringIO(), io.StringIO()
    get_job_logger(stream=buf1, pipeline="a")
    log = get_job_logger(stream=buf2, pipeline="b")
    log.info("x")
    assert buf1.getvalue() == ""  # old handler replaced, not stacked
    assert json.loads(buf2.getvalue())["job"] == {"pipeline": "b"}
