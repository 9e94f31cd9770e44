"""Sequential time-series recurrences over grouped series (EWMA).

An exponentially-weighted moving average is a linear recurrence
``s_i = α·x_i + (1-α)·s_{i-1}`` — NOT expressible as a Spark window frame
aggregate: the frame machinery computes associative combines, and the
closed-form trick (``s_i = Σ α(1-α)^{i-j} x_j``) needs ``(1-α)^{-j}``
factors that overflow doubles after ~1000 steps.  The scalable shape is a
grouped Arrow fold: one shuffle on the series key, then a per-series
``applyInPandas`` pass in arrival order.  Series length is bounded by the
calendar (days/months), not the data volume, so groups stay small at
100 TB — the heavy lifting (the daily rollup) happens BEFORE the fold in
plain hash aggregates.  For series too long for one group, fold fixed
epochs and carry ``(1-α)^{epoch_len}``-scaled state across them — the
recurrence is linear, so state composition is exact.

Cross-engine determinism: the kernel evaluates ``α·x + (1-α)·s`` as two
IEEE-double multiplies and one add, exactly the expression a SQL oracle's
recursive CTE evaluates — bit-identical per step, no tolerance needed
(Python floats ARE IEEE doubles; no numpy intermediates that could fuse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType


def ewma(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Append ``out_col`` = per-``keys`` EWMA of ``value_col`` in
    ``order_col`` order; ``s_1 = x_1``.

    ``order_col`` values must be unique per key (e.g. a calendar bucket) —
    the fold order is otherwise ambiguous and no engine pair would agree.
    """
    a = float(alpha)
    b = 1.0 - a
    out_schema = StructType(
        df.schema.fields + [StructField(out_col, DoubleType(), True)]
    )

    def fold(pdf):
        pdf = pdf.sort_values(order_col)
        s = None
        out = []
        for x in pdf[value_col]:
            x = float(x)
            s = x if s is None else a * x + b * s
            out.append(s)
        pdf = pdf.copy()
        pdf[out_col] = out
        return pdf

    return df.groupBy(*keys).applyInPandas(fold, schema=out_schema)
