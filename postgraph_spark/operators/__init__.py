from postgraph_spark.operators import dedup, similarity, vle  # noqa: F401
