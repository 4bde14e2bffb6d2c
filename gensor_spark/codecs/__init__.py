from gensor_spark.codecs.gorilla import (
    encode_series,
    decode_series,
    encode_docs,
    decode_docs,
)

__all__ = ["encode_series", "decode_series", "encode_docs", "decode_docs"]
