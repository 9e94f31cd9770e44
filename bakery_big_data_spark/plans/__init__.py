"""Query catalog: every implemented operator registered as a named query.

Importing this package populates :data:`REGISTRY` from the per-family
modules; ``__spark_entry__.py`` re-exports it to the correctness driver.
"""

from bakery_big_data_spark.plans.base import REGISTRY, Query, register

# Import for side effect: each module registers its queries.
from bakery_big_data_spark.plans import relational  # noqa: F401
from bakery_big_data_spark.plans import aggregates  # noqa: F401
from bakery_big_data_spark.plans import joins  # noqa: F401
from bakery_big_data_spark.plans import windows  # noqa: F401
from bakery_big_data_spark.plans import scalars  # noqa: F401
from bakery_big_data_spark.plans import medallion  # noqa: F401
from bakery_big_data_spark.plans import textops  # noqa: F401
from bakery_big_data_spark.plans import dedup  # noqa: F401
from bakery_big_data_spark.plans import similarity  # noqa: F401
from bakery_big_data_spark.plans import multimodal  # noqa: F401
from bakery_big_data_spark.plans import io_paths  # noqa: F401
from bakery_big_data_spark.plans import streaming_q  # noqa: F401
from bakery_big_data_spark.plans import pipeline_q  # noqa: F401
from bakery_big_data_spark.plans import extended  # noqa: F401
from bakery_big_data_spark.plans import setops_sql  # noqa: F401
from bakery_big_data_spark.plans import dashboard  # noqa: F401

__all__ = ["REGISTRY", "Query", "register"]
