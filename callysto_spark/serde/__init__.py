from callysto_spark.serde.avro import (
    avro_schema_to_spark,
    decode_avro,
    encode_avro,
    decode_json,
    encode_json,
)

__all__ = [
    "avro_schema_to_spark",
    "decode_avro",
    "encode_avro",
    "decode_json",
    "encode_json",
]
