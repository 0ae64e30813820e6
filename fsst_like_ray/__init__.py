"""fsst_like_ray — a Ray-Data-native per-column lightweight-compression engine.

Built from scratch (NOT a port) with the query/data-processing capabilities of
the reference ``utndatasystems/fsst-like`` (/root/reference): FSST-style symbol
tables, dictionary, RLE, frame-of-reference and bit-packing codecs with
per-partition codec auto-selection, LIKE-predicate push-down on compressed
data, skew-aware partitioning, per-partition lineage manifests, and a suite of
large-scale training-data operators (dedup, similarity search, text analysis).

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines with
zero-copy Arrow ``map_batches`` stages; stateful stages (codec training) are
actor pools.
"""

__version__ = "0.1.0"
