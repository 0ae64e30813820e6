from .compress import (
    encode_dataset,
    decode_dataset,
    compress_dataset,
    read_encoded,
    verify_roundtrip,
    verify_roundtrip_manifest,
)

__all__ = [
    "encode_dataset",
    "decode_dataset",
    "compress_dataset",
    "read_encoded",
    "verify_roundtrip",
]
