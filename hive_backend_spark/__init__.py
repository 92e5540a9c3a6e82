"""hive_backend_spark — a PySpark-native analytics engine reproducing the
query and data-processing capabilities of saint0x/hive-backend (see SURVEY.md).

The reference is a Sheets<->Slides sync backend whose data layer is a SQLite
message-queue + relational store (reference: db.mjs, server.mjs). This package
re-expresses every relational / queue / scalar operation Spark-first
(DataFrame + Catalyst), adds the streaming mirrors of the queue semantics
(Structured Streaming), and extends the surface with large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) designed for a 1000-executor / 100 TB deployment while
staying verifiable on local test data.

Layout:
    session.py    SparkSession factory with scale-oriented defaults
    catalog.py    parquet table loading / view registration
    registry.py   (name -> spark callable, oracle SQL) registry consumed by
                  __spark_entry__.py
    functions/    scalar column helpers (SURVEY §2.7)
    operators/    mutation/dedup/topk building blocks (SURVEY §2.10, §2.3)
    queries/      named, oracle-checked query definitions (SURVEY §2, §7)
    streaming/    Structured Streaming mirrors of the queue semantics (§2.9)
"""

__version__ = "0.1.0"
