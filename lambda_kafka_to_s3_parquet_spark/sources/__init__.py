"""Sources: Kafka event replay + Confluent-Avro codec.

``kafka_replay`` produces the exact Kafka-source schema from Lambda event
fixtures (batch + streaming); ``avro_codec`` splits the Confluent envelope
JVM-side and decodes Avro bodies in Arrow batches with a memoized schema
provider.
"""

from .avro_codec import (  # noqa: F401
    AvroField,
    SchemaProvider,
    decode_stage,
    key_cascade,
    route_by_topic,
)
from .kafka_replay import (  # noqa: F401
    REFERENCE_TOPICS,
    envelope_to_kafka,
    kafka_source,
    kafka_source_options,
    normalize_kafka_source,
    read_lambda_events,
    stream_lambda_events,
)
