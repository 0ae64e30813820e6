"""Committed store → deterministic, resumable training-batch loader.

The final mile of the engine: a training job consumes the encoded store as
a stream of token-budgeted batches of WHOLE sequences (fairseq-style
``max_tokens`` dynamic batching — documents are never split; splitting to
fixed length is :mod:`..functions.packing`'s job). Serves BOTH store
formats through one API: the per-column table store (compress_table) and
the flagship encoded-token corpus (compress_dataset), whose plain n_tok
column makes the planning pass a bare parquet column read. Guarantees:

- **Deterministic**: batch boundaries are a pure function of the store
  (fragment order = input-path order from the lineage manifest; row order =
  part/row order within a fragment) and ``batch_tokens``. Re-runs, resumes
  and different readers always see identical batches.
- **Fragment-aligned**: batches never cross fragment boundaries, so batch
  counts are per-fragment-local and the global step index is a cumulative
  sum over the manifest — a resume SEEKS: fragments wholly before
  ``start_step`` are never opened, and the plan pass itself reads ONLY the
  encoded token-count column (a few bytes per row), never the payloads.
- **Data-parallel**: ``rank``/``world_size`` shard whole fragments
  round-robin (deterministic by the same fragment order); each rank owns a
  disjoint fragment subset and numbers its own steps 0..N_r. Shard balance
  is fragment-granular — compact the store to even fragment sizes first if
  ranks must match closely.
- **Epoch shuffle**: ``epoch=(seed, epoch)`` permutes the FRAGMENT order by
  the deterministic epoch key (functions/shuffle.py) before rank sharding —
  the shard-level shuffle every large-scale loader uses (a true row-level
  epoch reshuffle is :func:`..functions.shuffle.epoch_shuffle`'s full
  range-sort; at the loader we keep within-fragment locality and reshuffle
  which shard comes when, and which rank owns it, per epoch). All
  guarantees above (determinism, seekable resume, disjoint ranks) hold
  per (seed, epoch).
- **Bounded memory**: one fragment's selected columns decode at a time
  (a fragment is one ingest file — ~1 GB at production sizing), then slice
  into batches; nothing global materializes.

A batch whose single row exceeds ``batch_tokens`` is emitted alone (the
caller chose the budget; dropping data silently would be worse) — the
``oversized`` flag marks it.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..state.manifest import Manifest
from .columnar import _encoded_field_names, decode_columns_batch
from .tablestore import _fragment_parts


def _parts_in_order(store_dir: str, frag_key: str, fmt: str) -> list[str]:
    """A fragment's part files in deterministic row order: numeric
    row-group index for the table store; lexicographic content-hash tag
    for the corpus store (arbitrary but stable — the loader's contract is
    determinism, and every consumer sees the same order)."""
    data_dir = os.path.join(store_dir, "data")
    if fmt == "table":
        return _fragment_parts(data_dir, frag_key)
    d = os.path.join(data_dir, f"frag={frag_key}")
    if not os.path.isdir(d):
        return []
    return [
        os.path.join(d, f)
        for f in sorted(os.listdir(d))
        if f.startswith("part-") and f.endswith(".parquet")
    ]


def greedy_boundaries(
    n_tok: np.ndarray, batch_tokens: int, batch_rows: int | None = None
) -> np.ndarray:
    """Row indices [0, b1, b2, ..., n] of greedy token-budget batches:
    each batch takes the longest row-prefix whose token sum stays within
    ``batch_tokens`` (at least one row) AND, when ``batch_rows`` is set,
    at most that many rows (trainers cap sequences per batch alongside
    tokens). O(#batches) via searchsorted over the cumulative sum — no
    per-row Python."""
    if batch_tokens <= 0:
        raise ValueError("batch_tokens must be positive")
    if batch_rows is not None and batch_rows < 1:
        raise ValueError("batch_rows must be >= 1")
    n = len(n_tok)
    cs = np.cumsum(n_tok, dtype=np.int64)
    bounds = [0]
    i = 0
    base = 0
    while i < n:
        j = int(np.searchsorted(cs, base + batch_tokens, side="right"))
        if j <= i:  # single row over budget: its own (oversized) batch
            j = i + 1
        if batch_rows is not None:
            j = min(j, i + batch_rows)
        bounds.append(j)
        base = int(cs[j - 1])
        i = j
    return np.asarray(bounds, dtype=np.int64)


def _ordered_fragments(
    store_dir: str, rank: int, world_size: int, epoch=None
) -> list:
    recs = Manifest(store_dir).completed()
    if not recs:
        raise FileNotFoundError(
            f"loader: no committed fragments under {store_dir!r}"
        )
    ordered = sorted(recs.values(), key=lambda r: r["fragment"])
    ordered = [r for r in ordered if int(r.get("rows", 0)) > 0]
    if epoch is not None:
        from ..functions.shuffle import epoch_key

        seed, ep = epoch
        # frag_key is 16 hex chars; its low 60 bits make a stable int id
        ids = np.array(
            [int(r["frag_key"], 16) & ((1 << 60) - 1) for r in ordered],
            dtype=np.int64,
        )
        keys = epoch_key(ids, seed, ep)
        order = np.lexsort((np.arange(len(ordered)), keys))
        ordered = [ordered[i] for i in order]
    return ordered[rank::world_size]


def _store_format(store_dir: str) -> str:
    """'table' (compress_table per-column store) or 'corpus' (the flagship
    compress_dataset encoded-token store, whose rows carry their own
    codec/state/payload and keep n_tok as a PLAIN column — so planning
    reads it without touching payloads). Detected once from any part's
    schema."""
    for rec in Manifest(store_dir).completed().values():
        parts = _parts_in_order(store_dir, rec["frag_key"], "corpus")
        if parts:
            names = pq.read_schema(parts[0]).names
            return "corpus" if "payload" in names else "table"
    raise FileNotFoundError(
        f"loader: no committed fragment parts under {store_dir!r}"
    )


def _read_fragment(
    store_dir: str, frag_key: str, columns, fmt: str = "table"
) -> pa.Table:
    """One fragment's selected columns, decoded, rows in store order
    (within a corpus fragment: part-name order — deterministic, since
    part names are content hashes)."""
    parts = _parts_in_order(store_dir, frag_key, fmt)
    if not parts:
        raise FileNotFoundError(f"loader: fragment {frag_key} has no parts")
    if fmt == "corpus":
        want = set(columns)
        if want <= {"doc_id", "n_tok", "source"}:  # plain columns: no decode
            return pa.concat_tables(
                pq.read_table(p, columns=list(columns)) for p in parts
            )
        from ..stages.decode import decode_batch

        return pa.concat_tables(
            decode_batch(pq.read_table(p)).select(list(columns))
            for p in parts
        )
    keep = _encoded_field_names(list(pq.read_schema(parts[0]).names), columns)
    dec = [
        decode_columns_batch(pq.read_table(p, columns=keep)) for p in parts
    ]
    return pa.concat_tables(dec)


def plan_training_batches(
    store_dir: str,
    batch_tokens: int,
    n_tok_col: str = "n_tok",
    rank: int = 0,
    world_size: int = 1,
    epoch: tuple[int, int] | None = None,
    batch_rows: int | None = None,
    parallel: bool | None = None,
    order: str = "store",
    keep_sources: "list[str] | None" = None,
) -> list[dict]:
    """The seek index: per owned fragment (in order), the greedy batch
    boundaries — computed from the encoded ``n_tok_col`` ALONE (plus the
    plain ``source`` column when ``keep_sources`` filters). Returns
    [{"frag_key", "fragment", "first_step", "boundaries"}, ...].

    ``keep_sources``: serve only rows whose ``source`` is in the list —
    the domain-ablation shape (train without one source) WITHOUT
    rewriting the store: filtering happens in the plan (a row-index
    subset per fragment), payloads of dropped rows never decode, and it
    composes with every ``order`` mode (length/shuffle act on the kept
    subset).

    ``parallel``: fan the per-fragment n_tok reads out as Ray tasks (the
    boundaries are per-fragment-local, so the plan parallelizes perfectly;
    only (frag_key, boundaries) rows return to the driver). Default None =
    auto: parallel when a Ray session is live and the rank owns more than
    32 fragments — at 100 TB the plan is otherwise an O(#fragments)
    sequential scan standing between a restart and its first batch.
    Results are bit-identical either way.

    ``order``: "store" (default) packs rows in store order; "length"
    stably sorts each fragment's rows by n_tok first, so batches hold
    similar-length sequences — for fixed-shape trainers that pad to the
    batch max, this cuts padding waste while staying deterministic and
    fragment-local (no shuffle; document locality within a batch is
    traded away); "shuffle" permutes each fragment's rows with a
    deterministic per-(seed, epoch, fragment) key — combined with the
    ``epoch`` fragment-order shuffle this is the standard approximate
    GLOBAL shuffle a pretraining run wants (local randomness inside each
    fragment, global randomness across fragments) with zero data
    movement: the permutation exists only in the plan."""
    if order not in ("store", "length", "shuffle"):
        raise ValueError(
            f"order must be 'store', 'length' or 'shuffle', got {order!r}"
        )
    if not 0 <= rank < world_size:
        raise ValueError(f"rank {rank} not in [0, {world_size})")
    fmt = _store_format(store_dir)
    params = {
        "batch_tokens": batch_tokens,
        "n_tok_col": n_tok_col,
        "rank": rank,
        "world_size": world_size,
        "epoch": tuple(epoch) if epoch is not None else None,
        "batch_rows": batch_rows,
        "order": order,
        "keep_sources": (
            tuple(sorted(keep_sources)) if keep_sources is not None else None
        ),
    }
    recs = _ordered_fragments(store_dir, rank, world_size, epoch)

    def frag_bounds(frag_key: str):
        cols = [n_tok_col] + (["source"] if keep_sources is not None else [])
        frag = _read_fragment(store_dir, frag_key, cols, fmt)
        nt = frag[n_tok_col].to_numpy(zero_copy_only=False).astype(np.int64)
        row_order = None
        if keep_sources is not None:
            src = frag["source"]
            if isinstance(src, pa.ChunkedArray):
                src = src.combine_chunks()
            m = pa.compute.is_in(
                src, value_set=pa.array(sorted(keep_sources))
            ).to_numpy(zero_copy_only=False)
            row_order = np.flatnonzero(m).astype(np.int64)
            nt = nt[row_order]
        if order == "length":
            sub = np.argsort(nt, kind="stable").astype(np.int64)
            row_order = sub if row_order is None else row_order[sub]
            nt = nt[sub]
        elif order == "shuffle":
            from ..functions.shuffle import epoch_key

            seed, ep = epoch if epoch is not None else (0, 0)
            # mix the fragment id into the seed so every fragment gets an
            # independent (but reproducible) permutation
            fid = int(frag_key, 16) & ((1 << 31) - 1)
            keys = epoch_key(
                np.arange(len(nt), dtype=np.int64), seed ^ fid, ep
            )
            sub = np.lexsort(
                (np.arange(len(nt), dtype=np.int64), keys)
            ).astype(np.int64)
            row_order = sub if row_order is None else row_order[sub]
            nt = nt[sub]
        return greedy_boundaries(nt, batch_tokens, batch_rows), row_order

    if parallel is None or parallel:
        try:
            import ray

            ray_ok = ray.is_initialized()
        except ImportError:
            ray_ok = False
        if parallel and not ray_ok:
            raise RuntimeError(
                "plan_training_batches(parallel=True) needs a live Ray "
                "session"
            )
        parallel = ray_ok and (parallel or len(recs) > 32)
    all_bounds: list[np.ndarray]
    if parallel:
        import ray

        @ray.remote
        def chunk_bounds(keys: list[str]):
            return [frag_bounds(k) for k in keys]

        keys = [r["frag_key"] for r in recs]
        step_n = max(1, (len(keys) + 127) // 128)  # ≤128 tasks per plan
        refs = [
            chunk_bounds.remote(keys[i : i + step_n])
            for i in range(0, len(keys), step_n)
        ]
        all_bounds = [b for chunk in ray.get(refs) for b in chunk]
    else:
        all_bounds = [frag_bounds(r["frag_key"]) for r in recs]

    plan = []
    step = 0
    for rec, (bounds, row_order) in zip(recs, all_bounds):
        ent = {
            "frag_key": rec["frag_key"],
            "fragment": rec["fragment"],
            "first_step": step,
            "boundaries": bounds,
            "params": params,
        }
        if row_order is not None:
            ent["row_order"] = row_order
        plan.append(ent)
        step += len(bounds) - 1
    return plan


def _materialize_fragment(store_dir, ent, cols, fmt, tokens_col):
    """Read + decode one plan fragment into the serving arrays: flat int32
    token values, int64 row offsets, and the id-column arrays. Pure
    function of its arguments — safe to run ahead on a prefetch thread."""
    tbl = _read_fragment(store_dir, ent["frag_key"], cols, fmt)
    if "row_order" in ent:  # order="length": the plan's permutation
        tbl = tbl.take(pa.array(ent["row_order"]))
    toks = tbl[tokens_col]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten().to_numpy(zero_copy_only=False).astype(
        np.int32, copy=False
    )
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    id_arrays = {
        c: tbl[c].to_numpy(zero_copy_only=False)
        for c in cols
        if c != tokens_col
    }
    return flat, offs, id_arrays


def iter_training_batches(
    store_dir: str,
    batch_tokens: int,
    columns=("doc_id", "tokens"),
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
    start_step: int = 0,
    rank: int = 0,
    world_size: int = 1,
    epoch: tuple[int, int] | None = None,
    batch_rows: int | None = None,
    order: str = "store",
    plan: list[dict] | None = None,
    prefetch: bool = True,
    keep_sources: "list[str] | None" = None,
):
    """Yield training batches from a committed store.

    Each batch is ``{"step", "n_rows", "n_tokens", "oversized",
    "tokens" (flat int32), "row_offsets" (int64, len n_rows+1),
    <id column arrays>}``. ``start_step`` resumes mid-stream: fragments
    whose batches all precede it are skipped via the plan (their payloads
    never decode). Pass a precomputed ``plan`` to skip even the n_tok
    planning pass on restart.

    ``prefetch`` (default on): fragment k+1's read+decode runs on ONE
    background thread while k's batches serve, bounded at one in-flight
    fragment — the decode-next stall overlaps the consumer's step time
    (parquet reads and the C decode kernels release the GIL). Results
    are bit-identical with it off."""
    if plan is None:
        plan = plan_training_batches(
            store_dir, batch_tokens, n_tok_col, rank, world_size, epoch,
            batch_rows, order=order, keep_sources=keep_sources,
        )
    elif plan:
        # a plan is a pure function of (store, these params): a reused plan
        # built for a DIFFERENT epoch/rank/budget would silently serve the
        # wrong order or the wrong shard — refuse instead
        want = {
            "batch_tokens": batch_tokens,
            "n_tok_col": n_tok_col,
            "rank": rank,
            "world_size": world_size,
            "epoch": tuple(epoch) if epoch is not None else None,
            "batch_rows": batch_rows,
            "order": order,
            "keep_sources": (
                tuple(sorted(keep_sources))
                if keep_sources is not None
                else None
            ),
        }
        have = plan[0].get("params")
        have = dict(
            have,
            epoch=tuple(have["epoch"]) if have.get("epoch") else None,
            keep_sources=(
                tuple(have["keep_sources"])
                if have.get("keep_sources")
                else None
            ),
        ) if have else None
        if have != want:
            raise ValueError(
                f"loader: plan was built with {have}, called with {want} — "
                "recompute the plan for these parameters"
            )
    cols = list(columns)
    if tokens_col not in cols:
        cols.append(tokens_col)
    fmt = _store_format(store_dir)
    ents = [
        ent
        for ent in plan
        if ent["first_step"] + len(ent["boundaries"]) - 1 > start_step
    ]

    def serve(ent, flat, offs, id_arrays):
        bounds = ent["boundaries"]
        for b in range(len(bounds) - 1):
            step = ent["first_step"] + b
            if step < start_step:
                continue
            r0, r1 = int(bounds[b]), int(bounds[b + 1])
            t0, t1 = int(offs[r0]), int(offs[r1])
            yield {
                "step": step,
                "n_rows": r1 - r0,
                "n_tokens": t1 - t0,
                "oversized": bool(
                    r1 - r0 == 1 and t1 - t0 > batch_tokens
                ),
                "tokens": flat[t0:t1],
                "row_offsets": offs[r0 : r1 + 1] - t0,
                **{c: a[r0:r1] for c, a in id_arrays.items()},
            }

    if prefetch and len(ents) > 1:
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=1)
        try:
            fut = pool.submit(
                _materialize_fragment,
                store_dir, ents[0], cols, fmt, tokens_col,
            )
            for i, ent in enumerate(ents):
                flat, offs, id_arrays = fut.result()
                if i + 1 < len(ents):
                    fut = pool.submit(
                        _materialize_fragment,
                        store_dir, ents[i + 1], cols, fmt, tokens_col,
                    )
                yield from serve(ent, flat, offs, id_arrays)
        finally:
            pool.shutdown(wait=False, cancel_futures=True)
    else:
        for ent in ents:
            flat, offs, id_arrays = _materialize_fragment(
                store_dir, ent, cols, fmt, tokens_col
            )
            yield from serve(ent, flat, offs, id_arrays)
