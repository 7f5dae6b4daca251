from glue_etl_framework_spark.io.readers import read_table  # noqa: F401
from glue_etl_framework_spark.io.writers import write_table  # noqa: F401
