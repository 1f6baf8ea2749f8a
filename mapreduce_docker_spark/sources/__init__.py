from mapreduce_docker_spark.sources.catalog import TABLES, load_table, register_views  # noqa: F401
