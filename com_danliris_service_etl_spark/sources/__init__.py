"""Sources & sinks (SURVEY.md §2.1): catalog of named tables, incremental
watermark protocol, and MERGE-style upsert sink."""

from com_danliris_service_etl_spark.sources.catalog import Catalog  # noqa: F401
from com_danliris_service_etl_spark.sources.watermark import WatermarkStore  # noqa: F401
from com_danliris_service_etl_spark.sources.sinks import merge_upsert  # noqa: F401
