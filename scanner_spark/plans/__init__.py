from scanner_spark.plans.graph import CacheMode, Graph

__all__ = ["CacheMode", "Graph"]
