from databus_spark.functions.hashes import (
    java_hash_sql,
    java_string_hashcode,
    portable_hash64,
    portable_hash64_sql,
)

__all__ = [
    "java_hash_sql",
    "java_string_hashcode",
    "portable_hash64",
    "portable_hash64_sql",
]
