"""Engine operators. Each module registers named queries with DuckDB oracle
twins via :mod:`kinesis_writer_spark.registry`.
"""
