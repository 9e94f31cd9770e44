from bakery_big_data_spark.sources.tables import TPCH_TABLES, load_table, load_tables

__all__ = ["TPCH_TABLES", "load_table", "load_tables"]
