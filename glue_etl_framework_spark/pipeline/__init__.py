from glue_etl_framework_spark.pipeline.config import load_config, interpolate, prepare_sql  # noqa: F401
from glue_etl_framework_spark.pipeline.runner import run_pipeline  # noqa: F401
