"""End-to-end Ray Data pipeline tests: encode → parquet → decode-verify,
manifest resume, skew planner (SURVEY.md §7.1 minimum slice + §5d)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from fsst_like_ray.sources.tokens import write_tokens_parquet, tokens_table


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    write_tokens_parquet(str(d), n_rows=4000, seed=42, rows_per_file=1000)
    return str(d)


def test_encode_decode_roundtrip(ray_session, corpus_dir, tmp_path):
    import ray.data
    from fsst_like_ray.pipelines import (
        compress_dataset,
        decode_dataset,
        read_encoded,
        verify_roundtrip,
    )
    from fsst_like_ray.pipelines.compress import read_encoded

    out = str(tmp_path / "encoded")
    stats = compress_dataset(corpus_dir, out, codec="auto")
    assert stats["fragments"] == 4
    assert stats["rows"] == 4000
    assert stats["encoded_bytes"] > 0
    # compression must beat plain on this corpus
    assert stats["encoded_bytes"] < stats["plain_bytes"]

    original = ray.data.read_parquet(corpus_dir)
    decoded = decode_dataset(read_encoded(out))
    v = verify_roundtrip(original, decoded)
    assert v["match"], v

    # lineage record carries the north-star fields: codec mix whose row
    # counts sum to the fragment's rows, plus a state (symbol-table) hash
    from fsst_like_ray.state.manifest import Manifest

    for rec in Manifest(out).completed().values():
        assert rec["codecs"] and sum(rec["codecs"].values()) == rec["rows"]
        assert isinstance(rec["state_sum"], int)
        from fsst_like_ray.codecs import CODECS

        assert set(rec["codecs"]) <= set(CODECS)


def test_resume_skips_completed(ray_session, corpus_dir, tmp_path):
    from fsst_like_ray.pipelines import compress_dataset
    from fsst_like_ray.state.manifest import Manifest
    from fsst_like_ray.pipelines.compress import discover_fragments

    out = str(tmp_path / "enc2")
    frags = discover_fragments(corpus_dir)
    # simulate a prior partial run: process only the first 2 fragments
    compress_dataset(frags[:2], out, codec="plain")
    m = Manifest(out)
    assert len(m.completed()) == 2
    before = {k: v for k, v in m.completed().items()}

    # resumed full run: the 2 finished fragments must be skipped (their
    # manifest records unchanged), the other 2 encoded
    stats = compress_dataset(corpus_dir, out, codec="plain")
    assert stats["fragments"] == 4
    after = m.completed()
    for k, v in before.items():
        assert after[k] == v


def test_forced_codec_pipeline(ray_session, corpus_dir, tmp_path):
    import ray.data
    from fsst_like_ray.pipelines import (
        compress_dataset,
        decode_dataset,
        verify_roundtrip,
    )
    from fsst_like_ray.pipelines.compress import read_encoded, discover_fragments

    frags = discover_fragments(corpus_dir)[:1]
    for codec in ["plain", "rle", "fsst"]:
        out = str(tmp_path / f"enc_{codec}")
        compress_dataset(frags, out, codec=codec)
        original = ray.data.read_parquet(frags)
        decoded = decode_dataset(read_encoded(out))
        v = verify_roundtrip(original, decoded)
        assert v["match"], (codec, v)


def test_skew_planner(ray_session, corpus_dir):
    import ray.data
    from fsst_like_ray.stages.skew import plan_partitions, n_tok_histogram

    ds = ray.data.read_parquet(corpus_dir)
    hist = n_tok_histogram(ds)
    total_rows = sum(c for c, _ in hist.values())
    total_tokens = sum(t for _, t in hist.values())
    assert total_rows == 4000
    pdf = pq.read_table(os.path.join(corpus_dir, os.listdir(corpus_dir)[0]))
    assert total_tokens > 0
    nb, _ = plan_partitions(ds, target_tokens_per_block=100_000)
    assert nb == max(1, int(np.ceil(total_tokens / 100_000)))


def test_decode_batch_mixed_states(ray_session):
    """Rows from different encode blocks (different symtabs) in ONE decode
    batch must still round-trip (parquet rewrite / shuffle scenario)."""
    import pyarrow as pa
    from fsst_like_ray.stages.encode import encode_table
    from fsst_like_ray.stages.decode import decode_batch

    t = tokens_table(400, seed=7)
    enc_a = encode_table(t.slice(0, 200), codec="fsst")
    enc_b = encode_table(t.slice(200, 200), codec="dict")
    mixed = pa.concat_tables([enc_a, enc_b]).combine_chunks()
    # interleave rows from the two blocks
    idx = list(range(0, 400, 2)) + list(range(1, 400, 2))
    mixed = mixed.take(pa.array(idx))
    dec = decode_batch(mixed)
    expect = t.take(pa.array(idx))
    assert dec["tokens"].to_pylist() == expect["tokens"].to_pylist()
    assert dec["doc_id"].to_pylist() == expect["doc_id"].to_pylist()


def test_resume_clears_stale_partial_output(ray_session, tmp_path):
    """A kill mid-round leaves partial parquet files in an UNCOMMITTED
    fragment's output dir; resume must replace them, not append (regression:
    duplicated rows after a real SIGKILL mid-write)."""
    import pyarrow.parquet as pq

    from fsst_like_ray.pipelines.compress import (
        compress_dataset,
        decode_dataset,
        discover_fragments,
        read_encoded,
        verify_roundtrip,
    )
    from fsst_like_ray.sources.tokens import write_tokens_parquet
    from fsst_like_ray.state.manifest import fragment_key

    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "enc")
    write_tokens_parquet(corpus, n_rows=1200, seed=19, rows_per_file=600)
    frags = discover_fragments(corpus)

    # complete fragment 0 only
    stats = compress_dataset(frags[:1], out, codec="plain")
    assert stats["fragments"] == 1

    # simulate a killed round: stale partial file in fragment 1's dir,
    # NOT committed to the manifest
    key = fragment_key(frags[1])
    stale_dir = tmp_path / "enc" / "data" / f"frag={key}"
    stale_dir.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pq.read_table(
            discover_fragments(str(tmp_path / "enc" / "data"))[0]
        ).slice(0, 50),
        str(stale_dir / "stale-partial.parquet"),
    )

    # resume: fragment 1 re-encodes; stale file must be gone from counts
    stats = compress_dataset(corpus, out, codec="plain")
    assert stats["fragments"] == 2 and stats["rows"] == 1200, stats
    import ray.data

    v = verify_roundtrip(
        ray.data.read_parquet(corpus), decode_dataset(read_encoded(out))
    )
    assert v["match"], v


def test_manifest_verify_and_corruption(ray_session, tmp_path):
    """Manifest-based decode-verify matches without re-reading the input,
    and detects a corrupted output file."""
    import shutil
    from fsst_like_ray.sources.tokens import write_tokens_parquet
    from fsst_like_ray.pipelines import compress_dataset, verify_roundtrip_manifest

    corpus = str(tmp_path / "tokens")
    out = str(tmp_path / "enc")
    write_tokens_parquet(corpus, n_rows=2048, seed=7, rows_per_file=512)
    compress_dataset(corpus, out, codec="auto", balance_tokens=200_000)
    v = verify_roundtrip_manifest(out)
    assert v["match"], v
    # drop one output file -> rows/hash must mismatch
    import os

    victim = None
    for root, _d, files in os.walk(os.path.join(out, "data")):
        for f in files:
            if f.endswith(".parquet"):
                victim = os.path.join(root, f)
                break
        if victim:
            break
    os.remove(victim)
    v2 = verify_roundtrip_manifest(out)
    assert not v2["match"]


def test_decode_verify_rows(ray_session, corpus_dir, tmp_path):
    """Per-row integrity: decode_dataset(verify_rows=True) passes on good
    data and names doc_ids when a payload is corrupted."""
    import pyarrow as pa
    import pyarrow.parquet as pq2
    import glob
    import ray.data
    from fsst_like_ray.pipelines import compress_dataset, decode_dataset, read_encoded

    out = str(tmp_path / "enc")
    compress_dataset(corpus_dir, out, codec="auto")
    n = decode_dataset(read_encoded(out), verify_rows=True).count()
    assert n == 4000
    # corrupt one row's payload bytes in one file (keep sizes valid)
    victim = sorted(glob.glob(out + "/data/**/*.parquet", recursive=True))[0]
    t = pq2.read_table(victim)
    pay = t["payload"].to_pylist()
    if len(pay[0] or b"") >= 2:
        pay[0] = bytes([pay[0][0] ^ 0x01]) + pay[0][1:]
    cols = {c: t[c] for c in t.column_names}
    cols["payload"] = pa.array(pay, type=pa.large_binary())
    pq2.write_table(pa.table(cols), victim)
    with pytest.raises(Exception, match="row-hash|row size|expand"):
        decode_dataset(read_encoded(out), verify_rows=True).count()


def test_transcode_encoded(ray_session, corpus_dir, tmp_path):
    """Recompression lifecycle: plain-encoded corpus → auto, no raw
    round-trip; destination manifest must reproduce the source lineage
    hashes bit-for-bit and decode back to the original corpus."""
    import ray.data
    from fsst_like_ray.pipelines.compress import (
        compress_dataset,
        decode_dataset,
        read_encoded,
        transcode_encoded,
        verify_roundtrip,
        verify_roundtrip_manifest,
    )
    from fsst_like_ray.state.manifest import Manifest

    src = str(tmp_path / "plain_enc")
    dst = str(tmp_path / "auto_enc")
    s1 = compress_dataset(corpus_dir, src, codec="plain")
    s2 = transcode_encoded(src, dst, codec="auto")
    assert s2["rows"] == s1["rows"] and s2["tokens"] == s1["tokens"]
    assert s2["encoded_bytes"] < s1["encoded_bytes"]  # auto must beat plain
    srecs = Manifest(src).completed()
    drecs = Manifest(dst).completed()
    assert set(drecs) == set(srecs)
    for f, sr in srecs.items():
        dr = drecs[f]
        assert (dr["hash_sum"], dr["hash_xor"], dr["rows"]) == (
            sr["hash_sum"], sr["hash_xor"], sr["rows"]
        )
        assert dr["transcoded_from"] == src
        assert sum(dr["codecs"].values()) == dr["rows"]
    assert verify_roundtrip_manifest(dst)["match"]
    v = verify_roundtrip(
        ray.data.read_parquet(corpus_dir),
        decode_dataset(read_encoded(dst)),
    )
    assert v["match"], v


def test_transcode_resume_and_corruption(ray_session, corpus_dir, tmp_path):
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from fsst_like_ray.pipelines.compress import (
        compress_dataset,
        transcode_encoded,
    )
    from fsst_like_ray.state.manifest import Manifest

    src = str(tmp_path / "src_enc")
    dst = str(tmp_path / "dst_enc")
    compress_dataset(corpus_dir, src, codec="plain")
    transcode_encoded(src, dst, codec="auto")
    recs = Manifest(dst).completed()
    assert len(recs) == 4

    # resume: drop one dst fragment's record + data; re-run restores ONLY
    # it (other record files untouched — mtimes unchanged)
    victim = sorted(recs.values(), key=lambda r: r["frag_key"])[0]
    os.remove(
        os.path.join(dst, "_manifest", f"{victim['frag_key']}.json")
    )
    import shutil

    shutil.rmtree(os.path.join(dst, "data", f"frag={victim['frag_key']}"))
    mtimes = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(dst, "_manifest", "*.json"))
    }
    transcode_encoded(src, dst, codec="auto")
    recs2 = Manifest(dst).completed()
    assert len(recs2) == 4
    assert recs2[victim["fragment"]]["hash_sum"] == victim["hash_sum"]
    for p, m in mtimes.items():
        assert os.path.getmtime(p) == m, p  # untouched fragments skipped

    # corruption: flip one payload byte in the SOURCE → transcode must
    # refuse (decoded-content hash mismatch vs source lineage)
    f = sorted(glob.glob(os.path.join(src, "data", "**", "*.parquet"),
                         recursive=True))[0]
    t = pq.read_table(f)
    pay = t["payload"].to_pylist()
    b = bytearray(pay[0])
    b[0] ^= 0xFF
    pay[0] = bytes(b)
    t = t.set_column(
        t.schema.get_field_index("payload"),
        "payload",
        pa.array(pay, type=t["payload"].type),
    )
    pq.write_table(t, f)
    dst2 = str(tmp_path / "dst2_enc")
    with _pytest.raises(ValueError, match="hash mismatch"):
        transcode_encoded(src, dst2, codec="auto")
    # the refused fragment's partial OUTPUT must be cleaned up — stale
    # bad files would otherwise sit next to a repaired re-run's files
    bad_key = os.path.basename(os.path.dirname(f)).split("=", 1)[-1]
    assert not os.path.exists(os.path.join(dst2, "data", f"frag={bad_key}"))
    assert bad_key not in {
        r["frag_key"] for r in Manifest(dst2).completed().values()
    }


def test_transcode_skips_uncommitted_source_fragments(
    ray_session, corpus_dir, tmp_path
):
    """A partial frag dir in the SOURCE (killed source run, no manifest
    record) has no lineage to verify against — transcode must not read
    or certify it."""
    import glob
    import shutil

    from fsst_like_ray.pipelines.compress import (
        compress_dataset,
        transcode_encoded,
    )
    from fsst_like_ray.state.manifest import Manifest

    src = str(tmp_path / "src_enc")
    dst = str(tmp_path / "dst_enc")
    compress_dataset(corpus_dir, src, codec="plain")
    # fake an uncommitted partial fragment: copy an existing frag dir
    # under a key that has NO manifest record
    some = sorted(
        glob.glob(os.path.join(src, "data", "frag=*"))
    )[0]
    rogue = os.path.join(src, "data", "frag=deadbeefdeadbeef")
    shutil.copytree(some, rogue)
    stats = transcode_encoded(src, dst, codec="auto")
    assert stats["fragments"] == 4  # the rogue partial is NOT certified
    keys = {r["frag_key"] for r in Manifest(dst).completed().values()}
    assert "deadbeefdeadbeef" not in keys
    assert not os.path.exists(
        os.path.join(dst, "data", "frag=deadbeefdeadbeef")
    )


def test_shared_table_roundtrip_and_lineage(ray_session, corpus_dir, tmp_path):
    """Global-symbol-table mode: one fsst table for every fragment —
    round-trip must stay bit-identical even for rows the training sample
    never saw (escape fallback), lineage must record the shared mode, and
    every fragment's state hash must be IDENTICAL (one table everywhere)."""
    import ray.data
    from fsst_like_ray.pipelines import compress_dataset, decode_dataset
    from fsst_like_ray.pipelines.compress import (
        read_encoded,
        train_shared_state,
        verify_roundtrip,
    )
    from fsst_like_ray.state.manifest import Manifest

    out = str(tmp_path / "enc_shared")
    stats = compress_dataset(corpus_dir, out, codec="fsst", shared_table=True)
    assert stats["fragments"] == 4

    original = ray.data.read_parquet(corpus_dir)
    decoded = decode_dataset(read_encoded(out))
    assert verify_roundtrip(original, decoded)["match"]

    recs = list(Manifest(out).completed().values())
    assert all(r["codec_mode"] == "fsst+shared" for r in recs)
    assert all(r["codecs"] == {"fsst": r["rows"]} for r in recs)
    # ONE table everywhere: equal-row fragments must checksum identically
    sums = {r["state_sum"] for r in recs if r["rows"] == recs[0]["rows"]}
    assert len(sums) == 1, sums

    # determinism: retraining from the same corpus gives the same table
    assert train_shared_state(corpus_dir) == train_shared_state(corpus_dir)


def test_shared_table_guards(ray_session, corpus_dir, tmp_path):
    import pytest as _pytest

    from fsst_like_ray.pipelines.compress import (
        compress_dataset,
        train_shared_state,
    )
    from fsst_like_ray.stages.encode import encode_table
    from fsst_like_ray.sources.tokens import tokens_table

    with _pytest.raises(ValueError, match="only sound"):
        train_shared_state(corpus_dir, codec="dict")
    with _pytest.raises(ValueError, match="explicit codec"):
        encode_table(tokens_table(8, seed=1), "auto", shared_state=b"x")
    with _pytest.raises(ValueError, match="only sound"):
        compress_dataset(
            corpus_dir, str(tmp_path / "x"), codec="auto", shared_table=True
        )


def test_shared_state_encodes_unseen_tokens(ray_session):
    """Train on one tiny distribution, encode a DISJOINT one: fsst escapes
    must keep the round-trip exact (the soundness claim behind
    SHARED_SAFE_CODECS)."""
    import numpy as np
    import pyarrow as pa

    from fsst_like_ray.codecs import CODECS
    from fsst_like_ray.stages.decode import decode_batch
    from fsst_like_ray.stages.encode import encode_table, list_buffers

    c = CODECS["fsst"]
    train_vals = np.arange(100, dtype=np.int32) % 7
    train_off = np.array([0, 50, 100], dtype=np.int64)
    state = bytes(c.train(train_vals, train_off))

    rng = np.random.default_rng(3)
    toks = rng.integers(10**6, 2**31 - 1, size=500, dtype=np.int32)
    batch = pa.table(
        {
            "doc_id": pa.array(np.arange(5), type=pa.int64()),
            "tokens": pa.ListArray.from_arrays(
                pa.array(np.arange(0, 501, 100, dtype=np.int32),
                         type=pa.int32()),
                pa.array(toks, type=pa.int32()),
            ),
            "n_tok": pa.array([100] * 5, type=pa.int32()),
            "source": pa.array(["s"] * 5),
        }
    )
    enc = encode_table(batch, "fsst", shared_state=state)
    dec = decode_batch(enc)
    got = np.concatenate(
        [np.asarray(r, dtype=np.int32) for r in dec["tokens"].to_pylist()]
    )
    assert np.array_equal(got, toks)


def test_shared_state_rejected_for_unsafe_codec_at_encode(ray_session):
    """The choke-point guard: a dict shared state must raise at
    encode_table, not corrupt silently."""
    import pytest as _pytest

    from fsst_like_ray.sources.tokens import tokens_table
    from fsst_like_ray.stages.encode import encode_table

    with _pytest.raises(ValueError, match="only sound"):
        encode_table(tokens_table(8, seed=2), "dict", shared_state=b"x")


def test_transcode_from_shared_table_corpus(ray_session, corpus_dir, tmp_path):
    """Lifecycle composition: a shared-symbol-table corpus transcodes to
    auto policy with lineage hashes reproduced bit-for-bit (the transcode
    self-verify) and decodes equal to the original."""
    import ray.data

    from fsst_like_ray.pipelines.compress import (
        compress_dataset,
        decode_dataset,
        read_encoded,
        transcode_encoded,
        verify_roundtrip,
    )
    from fsst_like_ray.state.manifest import Manifest

    src = str(tmp_path / "shared_src")
    dst = str(tmp_path / "auto_dst")
    compress_dataset(corpus_dir, src, codec="fsst", shared_table=True)
    stats = transcode_encoded(src, dst, codec="auto")
    assert stats["fragments"] == 4

    original = ray.data.read_parquet(corpus_dir)
    decoded = decode_dataset(read_encoded(dst))
    assert verify_roundtrip(original, decoded)["match"]
    # per-fragment lineage hashes must carry over exactly
    src_m = {r["frag_key"]: r for r in Manifest(src).completed().values()}
    dst_m = {r["frag_key"]: r for r in Manifest(dst).completed().values()}
    assert set(src_m) == set(dst_m)
    for k in src_m:
        assert src_m[k]["hash_sum"] == dst_m[k]["hash_sum"]
        assert src_m[k]["hash_xor"] == dst_m[k]["hash_xor"]
