from excelstream_spark.plans.catalog import CATALOG, QuerySpec, query, spark_queries, oracle_queries

__all__ = ["CATALOG", "QuerySpec", "query", "spark_queries", "oracle_queries"]
