from etl_pipeline2_0_spark.plans.registry import ALL_QUERIES, oracle_sql_map, query_map

__all__ = ["ALL_QUERIES", "query_map", "oracle_sql_map"]
