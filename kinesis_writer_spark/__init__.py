"""kinesis_writer_spark — a PySpark-native analytics engine with the data-processing
capabilities of audienceproject/kinesis-writer (KPL-aggregated Kinesis producer),
plus a relational operator core and LLM-data-pipeline operators, all designed to
run at 100 TB scale on a real cluster.

Layout:
    session     SparkSession builder tuned for the engine
    io          table loaders for the TESTDATA parquet fixtures
    kpl         pure-Python KPL aggregated-record encoder (wire-compatible)
    sink        size-bounded batching sink with retry/replay (reference parity)
    operators   relational + LLM-pipeline operators (DataFrame-first)
    streaming   Structured Streaming windows/watermark/sink fronts
"""

__version__ = "0.1.0"
