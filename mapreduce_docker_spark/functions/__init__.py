from mapreduce_docker_spark.functions.tokenize import WORD_PATTERN, tokens  # noqa: F401
