"""PySpark-native analytics engine with the query/data-processing
capabilities of danliris/com-danliris-service-etl.

Brand-new Spark-first implementation: declarative DataFrame/SQL plans
optimized by Catalyst, not a port of the reference's Node.js row-at-a-time
execution. See SURVEY.md for the capability inventory this covers.
"""

__version__ = "0.1.0"

from com_danliris_service_etl_spark.session import get_session  # noqa: F401
