"""Structured one-line-JSON job logging.

Maps the reference's loguru setup (/root/reference/glue/glue_etl_framework.py:311-359):
Every record is serialized to a single JSON line with timestamp, epoch, level,
file, function, line, module, name, message, and a ``job`` object carrying
the bound pipeline fields (reference ``log.configure(extra=job_fields)``,
:369-370/:425). Built on stdlib ``logging`` — no loguru dependency — so it
composes with whatever handlers the host environment adds.
"""

from __future__ import annotations

import json
import logging
import sys
from typing import Any, TextIO


class JsonLineFormatter(logging.Formatter):
    """Serialize the subset of the record the reference logs (:316-327)."""

    def format(self, record: logging.LogRecord) -> str:
        subset = {
            "timestamp": self.formatTime(record),
            "epoch": record.created,
            "level": record.levelname,
            "file": record.pathname,
            "function": record.funcName,
            "line": record.lineno,
            "module": record.module,
            "name": record.name,
            "message": record.getMessage(),
            "job": getattr(record, "job", {}),
        }
        return json.dumps(subset)


class _JobFieldsFilter(logging.Filter):
    def __init__(self, fields: dict[str, Any]):
        super().__init__()
        self.fields = fields

    def filter(self, record: logging.LogRecord) -> bool:
        record.job = self.fields
        return True


def get_job_logger(
    name: str = "glue_etl_framework_spark",
    stream: TextIO | None = None,
    **job_fields: Any,
) -> logging.Logger:
    """Logger emitting one JSON line per record with ``job_fields`` bound
    (the reference's ``get_logger`` + ``log.configure(extra=...)``,
    :337-359/:369-370). Repeated calls rebind the fields and reuse the
    handler — reconfiguration is idempotent, as in the reference's
    remove-and-add sink dance (:344-352)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    for f in list(logger.filters):
        logger.removeFilter(f)
    logger.addFilter(_JobFieldsFilter(dict(job_fields)))
    target = stream if stream is not None else sys.stderr
    for h in list(logger.handlers):
        logger.removeHandler(h)
    handler = logging.StreamHandler(target)
    handler.setFormatter(JsonLineFormatter())
    logger.addHandler(handler)
    return logger
