from sqlrs_tpu.data.batch import Column, DeviceBatch, Schema, SchemaField
from sqlrs_tpu.data.strings import GLOBAL_STRINGS, StringDictionary

__all__ = [
    "Column",
    "DeviceBatch",
    "Schema",
    "SchemaField",
    "StringDictionary",
    "GLOBAL_STRINGS",
]
