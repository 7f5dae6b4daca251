"""YAML config parsing + variable interpolation.

Maps the reference's config model (/root/reference/glue/glue_etl_framework.py):

- YAML document with ``job``, ``variables``, ``input_tables``,
  ``output_table``, ``sql``/``sql_file``, ``python_file`` (README.md:31-61);
  parsed with ``yaml.safe_load`` (reference :386). Local/URI paths replace
  the reference's boto3 S3 fetch (:375-384).
- Pipeline-scoped variables: ``config["variables"][pipeline]`` entries are
  ``{var}``-interpolated into every string config value *and the SQL text*
  (reference :20-48, :178). Deliberate divergences (SURVEY.md §5 bugs we do
  not copy): variables live in a scoped dict, never ``globals()``; unknown
  placeholders raise instead of being silently swallowed (:47-48); the SQL
  text is NOT whitespace-collapsed or quote-rewritten (:172-175 corrupts
  string literals and comments).
"""

from __future__ import annotations

import string
from pathlib import Path
from typing import Any

import yaml


def load_config(path: str | Path) -> dict[str, Any]:
    text = Path(path).read_text()
    config = yaml.safe_load(text)
    if not isinstance(config, dict):
        raise ValueError(f"config at {path} must be a YAML mapping")
    return config


def pipeline_variables(config: dict[str, Any], pipeline: str, overrides: dict[str, str] | None = None) -> dict[str, str]:
    """Variables for one pipeline (reference :20-34), plus CLI-style
    overrides (reference ``--variables`` arg, :363-366). A string value in
    Python-dict format is accepted like the reference's
    ``ast.literal_eval`` branch (:24-25, README.md: 'Config value should be
    in Python Dictionary format')."""
    raw = (config.get("variables") or {}).get(pipeline) or {}
    if isinstance(raw, str):
        import ast

        raw = ast.literal_eval(raw)
    if not isinstance(raw, dict):
        raise ValueError(f"variables for pipeline {pipeline!r} must be a mapping")
    variables = {str(k): str(v) for k, v in raw.items()}
    if overrides:
        variables.update({str(k): str(v) for k, v in overrides.items()})
    return variables


class _StrictFormatter(string.Formatter):
    def get_value(self, key, args, kwargs):  # noqa: ANN001
        if isinstance(key, str) and key not in kwargs:
            raise KeyError(f"undefined config variable {{{key}}}")
        return super().get_value(key, args, kwargs)


_FORMATTER = _StrictFormatter()


def interpolate(value: Any, variables: dict[str, str]) -> Any:
    """Recursively expand ``{var}`` placeholders in strings (reference
    ``getConfValue``, :36-48, applied to every config read)."""
    if isinstance(value, str):
        return _FORMATTER.vformat(value, (), variables)
    if isinstance(value, dict):
        return {k: interpolate(v, variables) for k, v in value.items()}
    if isinstance(value, list):
        return [interpolate(v, variables) for v in value]
    return value


def prepare_sql(sql: str, variables: dict[str, str]) -> str:
    """Variable-expand the SQL text (reference :178) and trim whitespace —
    NOTHING else. The reference also collapses whitespace (:172) and
    rewrites ' -> " (:175); both corrupt valid SQL (literals with
    apostrophes, ``--`` comments). An earlier version of this function
    stripped full comment lines and trailing semicolons here, but that is
    the same corruption class one level subtler: a multiline string
    literal whose continuation line starts with ``--`` was mangled
    (``'a\\n--x\\nb'`` -> ``'a\\n\\nb'``). Spark's parser natively accepts
    ``--`` comments, trailing semicolons, and even a semicolon followed by
    a trailing comment (probed on 4.1.2), so the only lexing-free-safe
    transformation is none at all."""
    return interpolate(sql, variables).strip()


def resolve_sql_text(config: dict[str, Any], variables: dict[str, str], base_dir: str | Path | None = None) -> str:
    """Inline ``sql`` key, else read ``sql_file`` (reference :141-163 —
    there an S3 GET; here a local/relative path)."""
    if config.get("sql"):
        return prepare_sql(str(config["sql"]), variables)
    sql_file = config.get("sql_file")
    if not sql_file:
        raise ValueError("config needs 'sql' or 'sql_file'")
    sql_file = interpolate(str(sql_file), variables)
    path = Path(sql_file)
    if base_dir is not None and not path.is_absolute():
        path = Path(base_dir) / path
    return prepare_sql(path.read_text(), variables)
