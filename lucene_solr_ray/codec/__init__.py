from .bloom import (
    FuzzySet,
    build_bloom,
    ensure_bloom,
    murmur2_hash32,
    murmur2_hash32_batch,
    read_bloom,
    write_bloom,
)
from .postings import (
    BLOCK_SIZE,
    block_offsets,
    decode_block,
    decode_postings,
    encode_postings,
)
from .smallfloat import (
    NORM_TABLE,
    byte315_to_float,
    encode_norm,
    float_to_byte315,
)

__all__ = [
    "BLOCK_SIZE",
    "FuzzySet",
    "NORM_TABLE",
    "build_bloom",
    "ensure_bloom",
    "murmur2_hash32",
    "murmur2_hash32_batch",
    "read_bloom",
    "write_bloom",
    "block_offsets",
    "byte315_to_float",
    "decode_block",
    "decode_postings",
    "encode_norm",
    "encode_postings",
    "float_to_byte315",
]
