"""Shared DuckDB-oracle comparison used by the query-catalog tests.

Mirrors the driver's t2 check: run the Spark query and the oracle SQL on the
same parquet tables, compare row count, column names, and an
order-insensitive value multiset (values normalized to strings with float
rounding only as a last resort — the catalog's decimal-sum convention should
make doubles bit-identical).
"""

from __future__ import annotations

import math
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

import duckdb

from bakery_big_data_spark.sources.tables import TPCH_TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — decimal-sum convention must hold
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    return str(v)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    cols = sorted(spark_df.columns)
    spark_rows = [
        tuple(_norm(row[c]) for c in cols) for row in spark_df.collect()
    ]
    oracle = con.execute(sql)
    ocols = [d[0] for d in oracle.description]
    assert sorted(ocols) == cols, f"columns differ: spark={cols} oracle={sorted(ocols)}"
    idx = [ocols.index(c) for c in cols]
    oracle_rows = [tuple(_norm(r[i]) for i in idx) for r in oracle.fetchall()]
    assert len(spark_rows) == len(oracle_rows), (
        f"row count differs: spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )
    sc, oc = Counter(spark_rows), Counter(oracle_rows)
    if sc != oc:
        only_spark = list((sc - oc).items())[:5]
        only_oracle = list((oc - sc).items())[:5]
        raise AssertionError(
            f"value multiset differs.\n only in spark: {only_spark}\n only in oracle: {only_oracle}"
        )
