"""bakery_big_data_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query / data-processing capability surface of
the public reference ``YasminAdler/bakery-big-data`` (a Kafka→Iceberg→Spark
medallion lakehouse), re-expressed as idiomatic Spark DataFrame/SQL code and
extended with large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns).

Design stance (SURVEY.md §7.1):
- pure DataFrame-in / DataFrame-out transform functions, no side effects
  until an explicit sink call;
- Catalyst does the optimizing — code declares logical plans with built-in
  functions, no row-at-a-time Python in hot paths;
- everything is designed for a 1000-executor / 100 TB deployment even though
  tests run on local[32]: broadcast small dims, avoid global sorts and
  driver collects, partition-prune on date columns.
"""

__version__ = "0.1.0"
