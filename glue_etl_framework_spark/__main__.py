"""CLI job launcher: ``python -m glue_etl_framework_spark``.

The reference's argv entry point is the "JOB STARTS HERE" block
(/root/reference/glue/glue_etl_framework.py:361-438): Glue resolves
``getResolvedOptions(sys.argv, ["JOB_NAME", "pipeline", "config_file",
"variables"])`` and dispatches on ``job.type``. This module is the
spark-submit / shell analogue: the same four options (Glue spells them
``--config_file``; both spellings are accepted), a local path or file://
URL instead of the reference's S3 URL, and ``run_pipeline`` as the body.

Exit codes: 0 on success, 2 for bad CLI usage (argparse), 1 for any
pipeline failure (missing config, unknown pipeline, undefined {variable},
SQL errors) — the message goes to stderr, mirroring the reference's
``sys.exit(message)`` paths (:382,:386,:436).
"""

from __future__ import annotations

import argparse
import json
import sys
from urllib.parse import urlparse


def _parse_variables(raw: str | None) -> dict[str, str]:
    """``--variables`` accepts a JSON object (documented) or the reference
    README's ``k1=v1,k2=v2`` shorthand; values are always strings."""
    if not raw:
        return {}
    text = raw.strip()
    if text.startswith("{"):
        obj = json.loads(text)
        if not isinstance(obj, dict):
            raise ValueError("--variables JSON must be an object")
        return {str(k): str(v) for k, v in obj.items()}
    pairs = [p for p in text.split(",") if p.strip()]
    out: dict[str, str] = {}
    for p in pairs:
        if "=" not in p:
            raise ValueError(f"--variables entry {p!r} is not k=v")
        k, v = p.split("=", 1)
        out[k.strip()] = v.strip()
    return out


def _local_path(config_file: str) -> str:
    """The reference takes an s3:// URL (:377-380); locally accept a plain
    path or a file:// URL."""
    url = urlparse(config_file, allow_fragments=False)
    if url.scheme in ("", "file"):
        return url.path or config_file
    raise ValueError(
        f"unsupported config scheme {url.scheme!r} (use a local path or file://)"
    )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m glue_etl_framework_spark",
        description="Run a YAML-configured pipeline (spark-sql or python-script job).",
    )
    p.add_argument("--pipeline", required=True, help="pipeline name (variables block key)")
    p.add_argument(
        "--config-file",
        "--config_file",
        dest="config_file",
        required=True,
        help="path to the YAML job config",
    )
    p.add_argument(
        "--variables",
        default=None,
        help='variable overrides: JSON object or "k1=v1,k2=v2"',
    )
    p.add_argument(
        "--JOB_NAME",
        "--job-name",
        dest="job_name",
        default="glue-etl-framework-spark",
        help="Spark application name (Glue contract compatibility)",
    )
    p.add_argument("--master", default=None, help="Spark master (default: local[*])")
    p.add_argument(
        "--conf",
        action="append",
        default=[],
        metavar="K=V",
        help="extra Spark conf (repeatable); applied after config defaults",
    )
    p.add_argument(
        "--dry-run",
        action="store_true",
        help="plan and print row count without writing the output table",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        overrides = _parse_variables(args.variables)
        config_path = _local_path(args.config_file)
        extra_conf = {}
        for entry in args.conf:
            if "=" not in entry:
                raise ValueError(f"--conf entry {entry!r} is not K=V")
            k, v = entry.split("=", 1)
            extra_conf[k] = v
        # imports after arg validation so --help stays instant
        from glue_etl_framework_spark.pipeline import run_pipeline
        from glue_etl_framework_spark.session import get_spark

        spark = get_spark(
            app_name=args.job_name, master=args.master, extra_conf=extra_conf
        )
        result = run_pipeline(
            spark,
            config_path,
            args.pipeline,
            variable_overrides=overrides,
            write=not args.dry_run,
        )
        if args.dry_run and hasattr(result, "count"):
            print(f"dry-run: {result.count()} rows", file=sys.stderr)
        return 0
    except Exception as exc:  # mirror the reference's sys.exit(message) paths
        print(f"ERROR: {exc}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
