from .encode import EncoderActor, ENCODED_SCHEMA_FIELDS
from .decode import decode_batch
from .verify import row_hashes

__all__ = ["EncoderActor", "ENCODED_SCHEMA_FIELDS", "decode_batch", "row_hashes"]
