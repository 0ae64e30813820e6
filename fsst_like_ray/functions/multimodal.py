"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool map_batches stages.

Decode is REAL for PNG / BMP / PNM images and PCM16 WAV audio via the
library-free codecs in :mod:`media_codecs` (stdlib zlib/wave + NumPy) —
``DecodeImage(fake=False)`` decodes those formats and extracts pixel-derived
features. Formats that require external codec libraries this environment
does not ship (JPEG, video frames) raise NotImplementedError per payload;
``fake=True`` keeps the deterministic hash-derived stub for opaque fixture
bytes so plumbing tests need no real payloads.

Scale notes encoded in the defaults: binary payloads are large, so
``batch_size`` is small (256) and the stage runs as an actor pool whose
__init__ would hold the (expensive) decoder/model handle. The per-row
decode loop is inherent (entropy-coded formats are not batch-vectorizable);
the actor pool is the parallelism axis.
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


def synth_real_media_table(n: int, seed: int = 42) -> pa.Table:
    """Fixture rows whose payloads are REAL decodable bytes: PNG, BMP and
    P6 PNM images with deterministic gradient pixels (dims derived from the
    row index so an oracle can recompute them without decoding)."""
    from .media_codecs import encode_bmp, encode_png

    rows_payload, widths, heights = [], [], []
    for i in range(n):
        w, h = 16 + (i % 4) * 8, 16
        yy, xx = np.mgrid[0:h, 0:w]
        img = ((xx * 7 + yy * 13 + i) % 256).astype(np.uint8)
        img3 = np.stack([img, img[::-1], img.T[:w, :h].T[:h, :w]], axis=2)
        kind = i % 3
        if kind == 0:
            payload = encode_png(img3)
        elif kind == 1:
            payload = encode_bmp(img3)
        else:
            payload = (
                b"P6\n%d %d\n255\n" % (w, h) + img3.tobytes()
            )
        rows_payload.append(payload)
        widths.append(w)
        heights.append(h)
    return pa.table(
        {
            "media_id": pa.array([f"m-{i:06d}" for i in range(n)]),
            "payload": pa.array(rows_payload, type=pa.large_binary()),
            "media_type": pa.array(["image"] * n),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "sample_rate": pa.array([0] * n, pa.int32()),
            "n_frames": pa.array([1] * n, pa.int32()),
        }
    )


class DecodeImage:
    """Actor stage: decode → per-image feature vector.

    ``fake=False`` REALLY decodes PNG/BMP/PNM payloads (media_codecs) and
    emits pixel-derived features [h, w, c, mean, std, mean_r, mean_g,
    mean_b]; entropy-coded formats needing external libraries (JPEG) raise.
    ``fake=True`` derives deterministic features from the raw payload bytes
    so plumbing tests can run on opaque fixtures."""

    def __init__(self, fake: bool = False, feature_dim: int = 8):
        self.fake = fake
        self.feature_dim = feature_dim
        # real decoder dispatch is resolved once per actor here — not per
        # batch (the import builds nothing heavy today, but this is the
        # slot where a model/codec handle would live)
        if not fake:
            from .media_codecs import decode_image as _di

            self._decode = _di

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            col = batch["payload"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            feats = np.zeros((batch.num_rows, self.feature_dim), np.float32)
            for i in range(batch.num_rows):
                img = self._decode(col[i].as_py())
                h, w, c = img.shape
                f = [h, w, c, float(img.mean()), float(img.std())]
                f += [float(img[:, :, k].mean()) for k in range(min(c, 3))]
                feats[i, : len(f[: self.feature_dim])] = f[: self.feature_dim]
            return pa.table(
                {
                    "media_id": batch["media_id"],
                    "features": pa.FixedSizeListArray.from_arrays(
                        pa.array(feats.reshape(-1), type=pa.float32()),
                        self.feature_dim,
                    ),
                    "decoded_ok": pa.array(
                        [True] * batch.num_rows, type=pa.bool_()
                    ),
                }
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
                "decoded_ok": pa.array(
                        [True] * batch.num_rows, type=pa.bool_()
                    ),
            }
        )


class DecodeAudio:
    """Actor stage: PCM16 WAV payloads → (media_id, sample_rate, n_samples,
    rms). Real decode via the stdlib wave module (media_codecs.decode_wav);
    compressed audio formats would need external libraries and raise."""

    def __init__(self):
        from .media_codecs import decode_wav as _dw

        self._decode = _dw

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["payload"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        rates, counts, rms = [], [], []
        for i in range(batch.num_rows):
            samples, rate = self._decode(col[i].as_py())
            rates.append(rate)
            counts.append(samples.shape[0])
            rms.append(
                float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
                if samples.size
                else 0.0
            )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "sample_rate": pa.array(rates, pa.int32()),
                "n_samples": pa.array(counts, pa.int64()),
                "rms": pa.array(rms, pa.float64()),
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
