"""lambda_kafka_to_s3_parquet_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline (productiveAnalytics/lambda_Kafka_to_S3_parquet): Kafka →
Confluent-Avro decode → date-partitioned Parquet landing, plus the full
relational read-back surface and large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Architecture is Spark-first: logical plans are declared with the
DataFrame/SQL API so Catalyst + Tungsten pick the physical strategy
(pushdown, pruning, broadcast, AQE); Python UDFs only appear where the
built-in operators genuinely cannot express the semantics (pure-Python Avro
body decode — the spark-avro module jar is not bundled with the pip
distribution — and multimodal payload stubs), and then always Arrow-batched
via ``mapInPandas``, never row-at-a-time.
"""

__version__ = "0.1.0"

from .session import get_spark, register_tables, load_table  # noqa: F401
