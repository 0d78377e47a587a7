"""idh_etl_demo_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ETL pipeline
(jakublaba/idh-etl-demo), re-expressed Spark-first.

Layout:
    session     SparkSession factory (AQE on, UTC, sane shuffle defaults)
    schemas     explicit StructTypes for every input and output table
    sources     readers (CSV feeds with declared schemas, parquet tables)
    functions   scalar column-expression library (no Python row UDFs)
    plans       star-schema table builders (5 dims + 1 fact) + registry
    operators   engine operators: mode-per-group, merge sink, dedup family,
                similarity search, text analysis, multimodal plumbing
    streaming   hourly micro-batch runner + Structured Streaming ingest
"""

__version__ = "0.1.0"
