"""Hot-user skew pairing for last-touch attribution (g15/st14).

The union-sort as-of plan's central scale claim (queries_round9b.py::
attributed_purchases) is that the naive per-purchase candidate join —
the oracle's row_number form — materializes |prior touches| rows PER
PURCHASE per user and therefore dies on hot users, while the running-
last window stays linear. This script MEASURES that claim on a derived
skewed clickstream: one hot user with HOT_EVENTS events (a bot/load-test
artifact, the shape every production clickstream has) among NORMAL_USERS
ordinary users.

Candidate-row arithmetic: the hot user's purchases x prior touches is
~(HOT_EVENTS/5) * (4*HOT_EVENTS/10) ~ 0.08 * HOT_EVENTS^2 rows through
the join (quadratic); the union-sort window carries ONE running row of
state over HOT_EVENTS sorted rows (linear).

Usage: python tools/bench_attribution_skew.py [HOT_EVENTS ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

OUT_DIR = os.path.join(ROOT, ".bench_sf1")
NORMAL_USERS = 1000
NORMAL_EVENTS = 50  # per normal user
RUNS = int(os.environ.get("BENCH_RUNS", "3"))
DAY_US = 86_400_000_000

ORACLE_SQL = """
WITH p AS (SELECT event_id, user_id, ts_us, value FROM ev
           WHERE event_type = 'purchase'),
t AS (SELECT event_id, user_id, ts_us, event_type FROM ev
      WHERE event_type <> 'purchase'),
cand AS (
  SELECT p.event_id AS pid, p.ts_us AS pts, p.value,
         t.event_type AS channel, t.ts_us AS tts,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY t.ts_us DESC, t.event_id DESC) AS rn
  FROM p LEFT JOIN t ON t.user_id = p.user_id AND t.ts_us <= p.ts_us)
SELECT CASE WHEN channel IS NOT NULL AND tts >= pts - 604800000000
            THEN channel ELSE 'unattributed' END AS channel,
       count(*) AS conversions
FROM cand WHERE rn = 1 GROUP BY 1
"""


def generate(hot_events: int) -> str:
    path = os.path.join(OUT_DIR, f"events_skew_{hot_events}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(OUT_DIR, exist_ok=True)
    con = duckdb.connect()
    # deterministic event types: every 5th event is a purchase
    con.execute(
        f"""
        COPY (
          WITH normal AS (
            SELECT (u.u * {NORMAL_EVENTS} + i.i)::BIGINT AS event_id,
                   u.u::BIGINT AS user_id,
                   (1600000000000000 + i.i * 3600000000)::BIGINT AS ts_us,
                   CASE i.i % 5 WHEN 0 THEN 'purchase' WHEN 1 THEN 'click'
                        WHEN 2 THEN 'view' WHEN 3 THEN 'signup'
                        ELSE 'error' END AS event_type,
                   (i.i % 97) / 10.0 AS value
            FROM (SELECT unnest(range({NORMAL_USERS})) AS u) u,
                 (SELECT unnest(range({NORMAL_EVENTS})) AS i) i),
          hot AS (
            SELECT (1000000000 + i.i)::BIGINT AS event_id,
                   {NORMAL_USERS}::BIGINT AS user_id,
                   (1600000000000000 + i.i * 60000000)::BIGINT AS ts_us,
                   CASE i.i % 5 WHEN 0 THEN 'purchase' WHEN 1 THEN 'click'
                        WHEN 2 THEN 'view' WHEN 3 THEN 'signup'
                        ELSE 'error' END AS event_type,
                   (i.i % 97) / 10.0 AS value
            FROM (SELECT unnest(range({hot_events})) AS i) i)
          SELECT * FROM normal UNION ALL SELECT * FROM hot
        ) TO '{path}' (FORMAT parquet)
        """
    )
    return path


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [5_000, 20_000]

    from pyspark.sql import functions as F

    from com_danliris_service_etl_spark.operators.joins import asof_join
    from com_danliris_service_etl_spark.session import get_session

    spark = get_session(
        app_name="bench-attr-skew",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE") or 32),
    )

    def spark_attr(path: str, strategy: str = "sort",
                   segment_width: int | None = None) -> int:
        ev = spark.read.parquet(path)
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts_us", "value"
        )
        touches = ev.filter(F.col("event_type") != "purchase").select(
            "user_id",
            F.col("ts_us").alias("touch_ts_us"),
            F.col("event_type").alias("touch_channel"),
            F.col("event_id").alias("touch_event_id"),
        )
        matched = asof_join(
            purchases, touches,
            left_on="ts_us", right_on="touch_ts_us",
            by=[("user_id", "user_id")],
            direction="backward", tiebreak="touch_event_id",
            allow_exact_match=True, strategy=strategy,
            segment_width=segment_width,
        )
        in_window = F.col("touch_channel").isNotNull() & (
            F.col("touch_ts_us") >= F.col("ts_us") - F.lit(7 * DAY_US)
        )
        return (
            matched.select(
                F.when(in_window, F.col("touch_channel"))
                .otherwise("unattributed")
                .alias("channel")
            )
            .groupBy("channel")
            .count()
            .count()
        )

    out = {}
    for hot in sizes:
        path = generate(hot)
        spark_attr(path)  # warm
        s_times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            spark_attr(path)
            s_times.append(time.perf_counter() - t0)
        # salted arm (VERDICT r11 task 8): the segmented strategy splits
        # the hot user's single window task across time segments; width =
        # one day of epoch-micros, the natural clickstream grain. The two
        # arms are result-identical (pinned in
        # test_asof_join_segmented_strategy_agrees_with_sort).
        spark_attr(path, strategy="segmented", segment_width=DAY_US)  # warm
        seg_times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            spark_attr(path, strategy="segmented", segment_width=DAY_US)
            seg_times.append(time.perf_counter() - t0)
        # the oracle is the QUADRATIC candidate-join form — it DNF'd at
        # 80k hot events (BASELINE.md); skip it for the Spark-vs-Spark
        # salting A/B where only the two window strategies are compared
        d_times = [float("nan")]
        if not os.environ.get("BENCH_SKEW_NO_ORACLE"):
            con = duckdb.connect()
            con.execute(f"CREATE VIEW ev AS SELECT * FROM '{path}'")
            con.execute(ORACLE_SQL).fetchall()
            d_times = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                con.execute(ORACLE_SQL).fetchall()
                d_times.append(time.perf_counter() - t0)
            con.close()
        out[hot] = {
            "spark_sec": round(min(s_times), 3),
            "spark_segmented_sec": round(min(seg_times), 3),
            "duckdb_sec": round(min(d_times), 3),
        }
        print(hot, out[hot], file=sys.stderr, flush=True)
    print(json.dumps({"normal_users": NORMAL_USERS, "hot_user_events": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
