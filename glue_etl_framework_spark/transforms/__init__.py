"""DataFrame verbs equivalent to the GlueTransforms surface.

The reference star-imports awsglue.transforms (glue_etl_framework.py:2),
exposing these to python-script jobs; here each is a plain function over
DataFrames (SURVEY.md §2.10 mapping table). All are thin, declarative, and
Catalyst-optimizable — no wrapper classes, no driver-side loops.
"""

from glue_etl_framework_spark.transforms.verbs import (  # noqa: F401
    apply_mapping,
    drop_fields,
    drop_null_fields,
    errors_as_frame,
    fill_missing_values,
    filter_rows,
    join,
    map_rows,
    relationalize,
    rename_field,
    resolve_choice,
    select_fields,
    spigot,
    split_fields,
    split_rows,
    union,
    unnest,
)
