"""Schema-ful payload serde (reference callysto-avro, SURVEY.md §2.1
S3-S5/S7).

The reference's only schema-ful surface is Avro: parse a schema string,
deserialize Kafka payloads to values / typed records / Polars DataFrames
(`callysto-avro/src/avro.rs:31-198`), and an Avro-encoding sink
(`avro.rs:238-331`). Here:

- ``avro_schema_to_spark``: Avro schema JSON → Spark StructType (pure
  Python — the analog of the reference's schema parse; records→struct,
  array→array, map→map, union-with-null→nullable, logical
  timestamp-micros/millis→timestamp, date→date, decimal→decimal).
- ``decode_avro`` / ``encode_avro``: column transforms over
  ``pyspark.sql.avro.functions`` — they require the spark-avro jar
  (not bundled with pip pyspark); gated with a clear error.
- ``decode_json`` / ``encode_json``: the jar-free schema-ful path
  (``from_json``/``to_json``) with the SAME StructType, so pipelines are
  serde-pluggable — the S5 "payload → DataFrame rows" shape is native
  either way.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import Column, functions as F, types as T

_PRIMITIVES: dict[str, T.DataType] = {
    "null": T.NullType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
}

_LOGICAL: dict[str, T.DataType] = {
    "timestamp-micros": T.TimestampType(),
    "timestamp-millis": T.TimestampType(),
    "date": T.DateType(),
    "time-micros": T.LongType(),
    "time-millis": T.IntegerType(),
    "uuid": T.StringType(),
}


def _convert(schema: Any) -> tuple[T.DataType, bool]:
    """Return (spark type, nullable)."""
    if isinstance(schema, str):
        if schema not in _PRIMITIVES:
            raise ValueError(f"unsupported avro type: {schema}")
        return _PRIMITIVES[schema], schema == "null"
    if isinstance(schema, list):  # union
        non_null = [s for s in schema if s != "null"]
        nullable = len(non_null) != len(schema)
        if len(non_null) != 1:
            raise ValueError(f"unsupported non-trivial union: {schema}")
        dt, _ = _convert(non_null[0])
        return dt, nullable
    if isinstance(schema, dict):
        logical = schema.get("logicalType")
        if logical:
            if logical == "decimal":
                return T.DecimalType(schema.get("precision", 38), schema.get("scale", 0)), False
            if logical in _LOGICAL:
                return _LOGICAL[logical], False
        t = schema["type"]
        if t == "record":
            fields = []
            for f in schema["fields"]:
                dt, nullable = _convert(f["type"])
                nullable = nullable or "default" in f and f["default"] is None
                fields.append(T.StructField(f["name"], dt, nullable))
            return T.StructType(fields), False
        if t == "array":
            dt, nullable = _convert(schema["items"])
            return T.ArrayType(dt, containsNull=nullable), False
        if t == "map":
            dt, nullable = _convert(schema["values"])
            return T.MapType(T.StringType(), dt, valueContainsNull=nullable), False
        if t == "enum":
            return T.StringType(), False
        if t == "fixed":
            return T.BinaryType(), False
        return _convert(t)
    raise ValueError(f"unsupported avro schema node: {schema!r}")


def avro_schema_to_spark(schema_json: str) -> T.StructType:
    """Avro record schema string → Spark StructType."""
    dt, _ = _convert(json.loads(schema_json))
    if not isinstance(dt, T.StructType):
        raise ValueError("top-level avro schema must be a record")
    return dt


def _avro_functions():
    try:
        from pyspark.sql.avro.functions import from_avro, to_avro

        return from_avro, to_avro
    except ImportError as exc:  # pragma: no cover
        raise RuntimeError(
            "avro serde requires the spark-avro jar "
            "(--packages org.apache.spark:spark-avro_2.13:<spark-version>)"
        ) from exc


_JAR_LOADED: dict[int, bool] = {}  # keyed by session id — classpaths differ


def avro_jar_loaded() -> bool:
    """True iff the spark-avro data source is on the active session's
    classpath. (The Python `from_avro` wrapper imports and even builds a
    Column without it — the AVRO_NOT_LOADED failure only fires at
    analysis — so 'auto' engine selection needs this explicit probe.)

    The probe result is cached PER SESSION (two sessions can have
    different classpaths), and not cached at all when there is no active
    session — otherwise a premature call would pin False forever and
    route a later jar-loaded session to the slower Python codec."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        return False  # no session to probe — don't poison the cache
    key = id(spark)
    if key not in _JAR_LOADED:
        try:
            # AvroDataSourceV2 ships only in the spark-avro jar;
            # a few avro shim classes (AvroFileFormat) are bundled in
            # spark-sql even without it, so probe the V2 source class
            spark._jvm.java.lang.Class.forName("org.apache.spark.sql.avro.AvroDataSourceV2")
            _JAR_LOADED[key] = True
        except Exception:
            _JAR_LOADED[key] = False
    return _JAR_LOADED[key]


def decode_avro(
    col: Column | str, schema_json: str, engine: str = "auto", mode: str = "failfast"
) -> Column:
    """Binary Avro payload column → struct column (S3/S4/S5).

    ``engine``: 'jvm' = spark-avro's from_avro (fastest, needs the jar);
    'python' = the pure-Python Arrow-batched codec (serde/avro_py.py, no
    jar); 'auto' = jvm if the jar is loaded, else python — so the Avro
    path always RUNS, jar or not.

    ``mode``: 'failfast' (default) aborts the task on a malformed
    payload; 'permissive' yields a struct with all fields NULL per bad
    record — same option, same semantics, on BOTH engines (spark-avro
    takes it as from_avro's option map and emits nullResultRow; the
    python codec catches the decoder's ValueError per record and emits
    the same all-null-fields struct).
    """
    # validate BEFORE the engine split: Spark's ParseMode.fromString
    # silently coerces unknown strings to PERMISSIVE, so a typo'd
    # 'fail_fast' on the jvm path would flip strict decoding to silent
    # nulling with only a log warning
    if mode not in ("failfast", "permissive"):
        raise ValueError(f"mode must be 'failfast' or 'permissive', got {mode!r}")
    if engine == "jvm" or (engine == "auto" and avro_jar_loaded()):
        from_avro, _ = _avro_functions()
        return from_avro(col, schema_json, {"mode": mode.upper()})
    from callysto_spark.serde.avro_py import decode_avro_udf

    return decode_avro_udf(schema_json, mode=mode)(F.col(col) if isinstance(col, str) else col)


def encode_avro(col: Column, schema_json: str | None = None, engine: str = "auto") -> Column:
    """Struct column → binary Avro payload (S7 sink encoding).
    The python engine needs ``schema_json`` (the jar derives it from the
    column type)."""
    if engine == "jvm" or (engine == "auto" and avro_jar_loaded()):
        _, to_avro = _avro_functions()
        # When a schema is declared, the writer MUST use it: to_avro(col)
        # alone derives the writer schema from the Catalyst type, whose
        # union branch order (["long","null"] vs the declared
        # ["null","long"]) need not match — and a from_avro reader holding
        # the declared schema would then misdecode every union field.
        return to_avro(col, schema_json) if schema_json is not None else to_avro(col)
    if schema_json is None:
        raise ValueError("encode_avro without the spark-avro jar needs schema_json")
    from callysto_spark.serde.avro_py import encode_avro_udf

    return encode_avro_udf(schema_json)(col)


def decode_json(col: Column | str, schema_json: str) -> Column:
    """Jar-free schema-ful decode: JSON payload → struct with the
    StructType derived from the SAME Avro schema."""
    return F.from_json(F.col(col).cast("string") if isinstance(col, str) else col.cast("string"),
                       avro_schema_to_spark(schema_json))


def encode_json(col: Column) -> Column:
    return F.to_json(col).cast("binary")
