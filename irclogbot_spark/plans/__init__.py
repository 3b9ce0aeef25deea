from irclogbot_spark.plans.partitioning import ensure_parallelism  # noqa: F401
