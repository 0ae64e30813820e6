"""Library-free media codecs: bit-exact pixel/sample round trips, PNG
filter-type coverage, and the real-decode driver query vs its oracle."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from fsst_like_ray.functions.media_codecs import (
    PNG_SIG,
    decode_bmp,
    decode_image,
    decode_png,
    decode_pnm,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
)


def _img(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_png_roundtrip(c):
    img = _img(13, 17, c)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_bmp_roundtrip():
    img = _img(9, 11, 3)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_pnm_roundtrip():
    img = _img(7, 5, 3)
    payload = b"P6\n5 7\n255\n" + img.tobytes()
    assert np.array_equal(decode_pnm(payload), img)
    gray = _img(4, 6, 1)
    payload = b"P5\n# comment\n6 4\n255\n" + gray.tobytes()
    assert np.array_equal(decode_pnm(payload), gray)


def test_wav_roundtrip():
    rng = np.random.default_rng(1)
    samples = rng.integers(-32768, 32767, (500, 2)).astype(np.int16)
    out, rate = decode_wav(encode_wav(samples, 22050))
    assert rate == 22050
    assert np.array_equal(out, samples)


def _png_with_filters(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Hand-built PNG applying a chosen filter type per scanline (reference
    filter application per the spec), to exercise decode's unfilter paths."""
    h, w, c = img.shape
    bpp = c
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int64)
    for y in range(h):
        line = img[y].reshape(-1).astype(np.int64)
        ft = ftypes[y % len(ftypes)]
        raw.append(ft)
        enc = np.zeros(w * c, dtype=np.int64)
        for x in range(w * c):
            a = int(line[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            cc = int(prev[x - bpp]) if x >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else cc)
            enc[x] = (line[x] - pred) & 0xFF
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line
    idat = zlib.compress(bytes(raw))

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_all_filter_types(ftypes):
    img = _img(10, 8, 3, seed=7)
    assert np.array_equal(decode_png(_png_with_filters(img, ftypes)), img)


def test_decode_image_dispatch_and_jpeg_stub():
    img = _img(6, 6, 3)
    assert np.array_equal(decode_image(encode_png(img)), img)
    assert np.array_equal(decode_image(encode_bmp(img)), img)
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0fakejpeg")
    with pytest.raises(NotImplementedError):
        decode_image(b"unknownformat")


def test_real_decode_stage_and_oracle(ray_session):
    import duckdb

    from fsst_like_ray.pipelines.queries import build_oracle_sql, q_multimodal_real

    t = q_multimodal_real("/root/testdata/sf0.001")
    got = t.to_pandas() if hasattr(t, "to_pandas") else t
    if hasattr(got, "to_arrow"):
        got = got.to_arrow().to_pandas()
    import pandas as pd

    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    exp = duckdb.connect().execute(
        build_oracle_sql()["multimodal_decode_real"]
    ).df()
    got = got.sort_values("media_id").reset_index(drop=True)
    exp = exp.sort_values("media_id").reset_index(drop=True)
    assert got["width"].astype(int).tolist() == exp["width"].astype(int).tolist()
    assert got["height"].astype(int).tolist() == exp["height"].astype(int).tolist()
    assert got["decoded_ok"].all()


def test_decode_audio_stage(ray_session):
    import ray.data

    from fsst_like_ray.functions.multimodal import DecodeAudio

    rng = np.random.default_rng(3)
    rows = []
    for i in range(10):
        n = 100 + 10 * i
        samples = rng.integers(-1000, 1000, (n, 1)).astype(np.int16)
        rows.append(
            {"media_id": f"a-{i}", "payload": encode_wav(samples, 8000 + i)}
        )
    t = pa.table(
        {
            "media_id": pa.array([r["media_id"] for r in rows]),
            "payload": pa.array(
                [r["payload"] for r in rows], type=pa.large_binary()
            ),
        }
    )
    out = (
        ray.data.from_arrow(t)
        .map_batches(DecodeAudio, batch_format="pyarrow", concurrency=1)
        .take_all()
    )
    by_id = {r["media_id"]: r for r in out}
    for i in range(10):
        r = by_id[f"a-{i}"]
        assert r["sample_rate"] == 8000 + i
        assert r["n_samples"] == 100 + 10 * i
        assert r["rms"] > 0


def test_jpeg_uses_optional_pillow(monkeypatch):
    """JPEG routes through Pillow when present (stubbed here — the lib is
    not in this container) and stays an honest NotImplementedError
    otherwise."""
    import numpy as np
    import pytest

    from fsst_like_ray.functions import media_codecs as mc

    class FakeImg:
        def convert(self, mode):
            assert mode == "RGB"
            return np.arange(12, dtype=np.uint8).reshape(2, 2, 3)

    class FakeImage:
        @staticmethod
        def open(fp):
            return FakeImg()

    monkeypatch.setattr(mc, "_PIL_MOD", FakeImage)
    out = mc.decode_image(b"\xff\xd8\xff\xe0 fake jpeg bytes")
    assert out.shape == (2, 2, 3) and out.dtype == np.uint8
    monkeypatch.setattr(mc, "_PIL_MOD", None)
    with pytest.raises(NotImplementedError, match="external library"):
        mc.decode_image(b"\xff\xd8\xff\xe0 fake jpeg bytes")
