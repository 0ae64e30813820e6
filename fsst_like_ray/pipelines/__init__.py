from .compress import (
    encode_dataset,
    decode_dataset,
    compress_dataset,
    read_encoded,
    verify_roundtrip,
)

__all__ = [
    "encode_dataset",
    "decode_dataset",
    "compress_dataset",
    "read_encoded",
    "verify_roundtrip",
]
