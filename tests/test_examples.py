"""The shipped example configs must actually run — they are the reference
README's two worked examples re-expressed for this engine."""

from __future__ import annotations

from pathlib import Path

from glue_etl_framework_spark.pipeline import run_pipeline
from tests.conftest import SF_SMOKE

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"


def test_example1_sales_by_region(tmp_path, spark):
    run_pipeline(
        spark,
        EXAMPLES / "sales_by_region.yaml",
        "demo",
        {"sf_dir": SF_SMOKE, "out_dir": str(tmp_path)},
    )
    out = spark.read.parquet(str(tmp_path / "sales_by_region"))
    assert out.count() == 5
    assert set(out.columns) == {"region", "total_amount", "n_items"}


def test_example2_daily_orders_incremental(tmp_path, spark):
    args = (spark, EXAMPLES / "daily_orders.yaml", "demo")
    overrides = {"sf_dir": SF_SMOKE, "out_dir": str(tmp_path)}
    run_pipeline(*args, overrides)
    first = spark.read.parquet(str(tmp_path / "daily_orders")).count()
    assert first > 0
    # incremental refresh on a partitioned table is idempotent per
    # partition: re-running the same day range rewrites, never duplicates
    run_pipeline(*args, overrides)
    spark.catalog.clearCache()
    again = spark.read.parquet(str(tmp_path / "daily_orders"))
    assert again.count() == first
    assert "order_day" in again.columns
