"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool map_batches stages.

The image/audio decode libraries are NOT in this environment, so the decode
kernels are STUBS: ``DecodeImage(fake=False)`` raises NotImplementedError;
``fake=True`` produces a deterministic fake decode (hash-derived pixel
statistics) so the Ray-side plumbing — schema, batch sizing, actor signature,
output layout — is real and tested end-to-end.

Scale notes encoded in the defaults: binary payloads are large, so
``batch_size`` is small (256) and the stage runs as an actor pool whose
__init__ would hold the (expensive) decoder/model handle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.large_binary()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)

RECOMMENDED_BATCH_SIZE = 256


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic opaque-binary fixture rows in MEDIA_SCHEMA."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, int(rng.integers(64, 4096)), dtype=np.uint8
                             ).tobytes() for _ in range(n)]
    types = [["image", "audio", "video"][i % 3] for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array([f"m-{i:06d}" for i in range(n)]),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "media_type": pa.array(types),
            "width": pa.array([64 + (i % 4) * 32 for i in range(n)], pa.int32()),
            "height": pa.array([64 for _ in range(n)], pa.int32()),
            "sample_rate": pa.array([16000] * n, pa.int32()),
            "n_frames": pa.array([1 + i % 30 for i in range(n)], pa.int32()),
        }
    )


class DecodeImage:
    """Actor stage: decode → per-image feature vector.

    Real decoding requires an image library (absent here); ``fake=True``
    derives deterministic features from the payload bytes so downstream
    stages can be exercised."""

    def __init__(self, fake: bool = False, feature_dim: int = 8):
        self.fake = fake
        self.feature_dim = feature_dim
        # a real implementation would open the decoder/model handle HERE,
        # once per actor — not per batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image decoding requires an image library not present in this "
                "environment; construct with fake=True for the deterministic stub"
            )
        # vectorized fake features: per-row chunk means via one prefix-sum
        # over the payload bytes (np.array_split semantics, no row loop)
        col = batch["payload"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        off = np.frombuffer(
            col.buffers()[1], dtype=np.int64, count=len(col) + 1 + col.offset
        )[col.offset :]
        base = off[0]
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)[base : off[-1]]
        off = off - base
        cs = np.zeros(len(data) + 1, dtype=np.int64)
        np.cumsum(data, out=cs[1:])
        n, d = batch.num_rows, self.feature_dim
        lens = np.diff(off)
        # np.array_split boundary rule: first (len % d) chunks get one extra
        q, r = lens // d, lens % d
        sizes = np.tile(q[:, None], (1, d))
        sizes[np.arange(d)[None, :] < r[:, None]] += 1
        bounds = np.concatenate(
            [np.zeros((n, 1), dtype=np.int64), np.cumsum(sizes, axis=1)], axis=1
        ) + off[:-1][:, None]
        sums = cs[bounds[:, 1:]] - cs[bounds[:, :-1]]
        with np.errstate(invalid="ignore"):
            feats = np.where(sizes > 0, sums / np.maximum(sizes, 1), 0.0)
        flat = feats.astype(np.float32).reshape(-1)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat, type=pa.float32()), self.feature_dim
                ),
                "decoded_ok": pa.array([True] * batch.num_rows),
            }
        )


class ResizeImage:
    """Actor stage stub: image resize (metadata transform is real, pixel
    transform is the stub)."""

    def __init__(self, width: int, height: int, fake: bool = False):
        self.width, self.height, self.fake = width, height, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("resize requires an image library")
        n = batch.num_rows
        return (
            batch.set_column(
                batch.schema.get_field_index("width"),
                "width",
                pa.array([self.width] * n, pa.int32()),
            ).set_column(
                batch.schema.get_field_index("height"),
                "height",
                pa.array([self.height] * n, pa.int32()),
            )
        )


class SampleFrames:
    """Actor stage: pick ``every_n``-th frame index per video row (the frame
    INDEX plan is real; frame extraction would need a video library)."""

    def __init__(self, every_n: int = 10):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        nf = batch["n_frames"].to_numpy(zero_copy_only=False).astype(np.int64)
        counts = (nf + self.every_n - 1) // self.every_n
        off64 = np.zeros(len(nf) + 1, dtype=np.int64)
        np.cumsum(counts, out=off64[1:])
        tot = int(off64[-1])
        wi = (
            np.arange(tot, dtype=np.int64)
            - np.repeat(off64[:-1], counts)
        ) * self.every_n
        frames = pa.ListArray.from_arrays(
            pa.array(off64.astype(np.int32), type=pa.int32()),
            pa.array(wi.astype(np.int32), type=pa.int32()),
        )
        return pa.table(
            {"media_id": batch["media_id"], "frame_indices": frames}
        )


def decode_pipeline(ds, fake: bool = True, feature_dim: int = 8):
    """Media dataset → per-item features, actor pool with small batches."""
    return ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"fake": fake, "feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=RECOMMENDED_BATCH_SIZE,
        concurrency=(1, 4),
    )
