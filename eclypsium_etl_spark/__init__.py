"""eclypsium_etl_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference ETL pipeline (`mbarbierif/eclypsium-etl`, surveyed in
/root/repo/SURVEY.md), re-expressed Spark-first: declarative DataFrame/SQL
plans optimized by Catalyst, Parquet storage with pushdown/pruning,
Structured Streaming for the streaming surface, and algorithmic layers
(as-of join, MinHash/LSH dedup, cosine top-k) built as
``DataFrame -> DataFrame`` compositions of stock operators.

Layout:
    session.py    SparkSession factory (AQE, Arrow, UTC, local tuning)
    schemas.py    explicit StructType schemas for the fixture tables
    io.py         Parquet/JSON/JDBC sources and sinks
    registry.py   query + oracle registry backing __spark_entry__.py
    operators/    relational operators (one module per SURVEY §2 group)
    streaming/    Structured Streaming operators (SURVEY §2.10)
    llm/          LLM-data-pipeline operators (SURVEY §2.12 + extensions)
    pipeline.py   the reference's flagship ETL pipeline, Spark-first
"""

__version__ = "0.1.0"
