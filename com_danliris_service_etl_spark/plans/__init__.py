"""Declarative query/job plans.

- `queries`: the driver-facing registry — every SURVEY.md §2 operator as a
  (spark_fn, oracle_sql) pair over the standard test tables.
- `jobs`: the reference's 22-job pipeline shape (watermark → extract →
  join → transform → merge-load) as a declarative JobSpec runner.
"""
