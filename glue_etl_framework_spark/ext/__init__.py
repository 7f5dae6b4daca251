"""EXT operators (north star BASELINE.json:6): the LLM-training-data
pipeline surface — dedup, similarity search, text analysis, multimodal
columns — designed for 100 TB.

The oracle-checked, engine-portable variants live in
glue_etl_framework_spark.queries.{dedup,similarity,text}; this package holds
the scale-path implementations whose internals aren't portable SQL
(pyspark.ml LSH models, pandas-UDF decoders) and is verified by pytest
metamorphic/recall tests instead.
"""
