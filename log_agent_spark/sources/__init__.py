from log_agent_spark.sources.tables import load_table, register_tables  # noqa: F401
