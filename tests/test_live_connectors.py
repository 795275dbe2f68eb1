"""Live connector smoke tests (VERDICT r10 task 7): a real SQL Server and
a real MongoDB, when reachable, prove the last connector risk closed; in
this sandbox (no containers, no connector jars) every test SKIPS with the
exact reason, never fails.

Gating contract:
- SQL Server: set SPARK_GRAFT_MSSQL_HOST / _DB / _USER / _PASSWORD
  (the reference's env contract, Connection/Purchasing/
  purchasing-connection.js:3-12). Additionally requires the MS JDBC
  driver class on the Spark classpath.
- MongoDB: set SPARK_GRAFT_MONGO_URI (+ optional _DB, default test).
  Additionally requires mongo-spark-connector on the classpath.

Class probes go through java.lang.Class.forName — plain py4j attribute
access NEVER raises for a missing class (it returns a silent JavaPackage
stub), so feature probes built on attributes always "succeed"."""

from __future__ import annotations

import os

import pytest


def _jvm_class_present(spark, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)
        return True
    except Exception:
        return False


def test_mssql_live_roundtrip(spark):
    host = os.environ.get("SPARK_GRAFT_MSSQL_HOST")
    if not host:
        pytest.skip("no live SQL Server (set SPARK_GRAFT_MSSQL_HOST/_DB/_USER/_PASSWORD)")
    if not _jvm_class_present(spark, "com.microsoft.sqlserver.jdbc.SQLServerDriver"):
        pytest.skip("MS SQL JDBC driver not on the Spark classpath")

    from com_danliris_service_etl_spark.sources.catalog import (
        Catalog,
        mssql_source,
    )

    src = mssql_source(
        host=host,
        database=os.environ.get("SPARK_GRAFT_MSSQL_DB", "master"),
        username=os.environ["SPARK_GRAFT_MSSQL_USER"],
        password=os.environ["SPARK_GRAFT_MSSQL_PASSWORD"],
        # the InitialTest/index.js:9-12 connectivity shape: one row back
        table="(SELECT 1 AS one) t",
    )
    cat = Catalog(spark=spark, tables={"smoke": src})
    rows = cat.read("smoke").collect()
    assert [r.one for r in rows] == [1]


def test_mongo_live_aggregation_pushdown(spark):
    uri = os.environ.get("SPARK_GRAFT_MONGO_URI")
    if not uri:
        pytest.skip("no live MongoDB (set SPARK_GRAFT_MONGO_URI)")
    if not _jvm_class_present(
        spark, "com.mongodb.spark.sql.connector.MongoTableProvider"
    ):
        pytest.skip("mongo-spark-connector not on the Spark classpath")

    from com_danliris_service_etl_spark.sources.catalog import Catalog, MongoSource

    # the MigrationLogFunc/index.js:14-45 aggregation: match successful
    # runs, sort by finish desc, first-per-description — pushed INTO
    # Mongo via aggregation.pipeline so only the argmax rows cross the wire
    pipeline = (
        '[{"$match": {"status": {"$in": ["Successful", "success"]}}},'
        ' {"$sort": {"finish": -1}},'
        ' {"$group": {"_id": "$description",'
        '  "finish": {"$first": "$finish"}, "status": {"$first": "$status"}}}]'
    )
    src = MongoSource(
        uri=uri,
        database=os.environ.get("SPARK_GRAFT_MONGO_DB", "test"),
        collection="migration-log",
        pipeline=pipeline,
    )
    cat = Catalog(spark=spark, tables={"mlog": src})
    df = cat.read("mlog")
    # at-most-one row per description is the aggregation's contract
    pdf = df.toPandas()
    assert pdf["_id"].is_unique


def test_mongo_missing_connector_error_is_actionable(spark):
    """Without the connector jar (this sandbox), Catalog.read must raise
    the actionable classpath error — not a bare DATA_SOURCE_NOT_FOUND —
    and must do so only for the missing-connector class of failure."""
    if _jvm_class_present(
        spark, "com.mongodb.spark.sql.connector.MongoTableProvider"
    ):
        pytest.skip("connector present — the live test covers this environment")

    from com_danliris_service_etl_spark.sources.catalog import Catalog, MongoSource

    src = MongoSource(uri="mongodb://localhost:27017", database="d", collection="c")
    cat = Catalog(spark=spark, tables={"m": src})
    with pytest.raises(RuntimeError, match="mongo-spark-connector"):
        cat.read("m")
