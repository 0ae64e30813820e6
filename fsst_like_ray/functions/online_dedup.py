"""Online (incremental) exact dedup against a SHARDED mutable registry.

The batch dedup operators (functions/dedup.py) assume one run sees the
whole corpus. A continuously-INGESTING pipeline needs cross-run state: a
registry of content already admitted, consulted as new data streams in.
The Dataset API cannot express a shared mutable index — the one case the
architecture brief reserves for raw ``@ray.remote`` actors — so the
registry is ``n_shards`` actors, each owning the hash range
``hash % n_shards == shard_id``. Actor method calls serialize per shard,
so concurrent batches can never double-admit the same content: whichever
batch's ``admit`` lands first wins and every later call sees the entry.

Determinism contract: keeper IDENTITY under concurrent ingest is
arrival-order dependent, but the SET of admitted texts — and therefore
every per-epoch count — is deterministic as long as each epoch's stream
is fully drained before the next begins (the registry state at an epoch
boundary is exactly "all distinct content seen so far"). Registrations
carry the row's unique id as an OWNER token, so a Ray task retry
re-sending the same rows gets the same verdicts (admission is
idempotent per row) — ids must therefore be unique across the
registry's lifetime, which any real ingest id is.

Scale: ``verify_texts=True`` stores hash → texts, which makes the
registry corpus-sized at 100 TB but collision-EXACT (same-hash different
texts are both admitted); ``verify_texts=False`` stores only the 64-bit
hashes (registry = 8 bytes/doc; collision odds ~n²/2⁶⁴ — wrong only by
dropping a colliding doc). Shards spread memory and serialize-point load;
each block pays one actor round-trip per shard."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .dedup import content_hash_batch


@ray.remote(num_cpus=0)  # registry shards are memory, not compute
class DedupShardActor:
    """One hash-range shard of the admitted-content registry."""

    def __init__(self, verify_texts: bool = True):
        self.verify = verify_texts
        self.seen: dict = {}

    def admit(self, hashes, owners, texts=None):
        """Boolean list: True where the entry is owned by ``owners[i]`` —
        newly registered now, or already registered TO THAT SAME owner id.
        The owner check makes admission IDEMPOTENT under Ray's
        at-least-once task retry: a retried block re-sends the same
        (hash, owner) pairs and gets the same verdicts, instead of seeing
        its own earlier registrations as duplicates and dropping rows.
        With ``verify_texts``, a same-hash different-text entry is a
        collision and is admitted as its own document (exact semantics)."""
        out = []
        if self.verify:
            for h, o, t in zip(hashes, owners, texts):
                bucket = self.seen.setdefault(h, {})
                cur = bucket.get(t)
                if cur is None:
                    bucket[t] = o
                    out.append(True)
                else:
                    out.append(cur == o)
        else:
            for h, o in zip(hashes, owners):
                cur = self.seen.get(h)
                if cur is None:
                    self.seen[h] = o
                    out.append(True)
                else:
                    out.append(cur == o)
        return out

    def n_entries(self) -> int:
        return len(self.seen)


class OnlineDedup:
    """Handle bundle for the sharded registry; reusable across any number
    of ``filter`` passes (epochs / ingestion runs)."""

    def __init__(self, n_shards: int = 8, verify_texts: bool = True):
        self.n_shards = n_shards
        self.verify = verify_texts
        self.shards = [
            DedupShardActor.remote(verify_texts) for _ in range(n_shards)
        ]

    def registry_size(self) -> int:
        return sum(ray.get([s.n_entries.remote() for s in self.shards]))

    def filter(
        self,
        ds: "ray.data.Dataset",
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> "ray.data.Dataset":
        """Rows whose content has NOT been seen before — not earlier in
        this stream, not by any previous ``filter`` pass on this registry.
        ``id_col`` must be unique per row: it is the registry OWNER token
        that makes admission idempotent when Ray retries a task. Consume
        (count/write/iterate) the result fully before starting the next
        epoch's pass."""
        shards = self.shards
        n_shards = self.n_shards
        verify = self.verify

        def filt(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            hb = content_hash_batch(batch, text_col)
            h = hb["content_hash"].to_numpy(zero_copy_only=False)
            owners = batch[id_col].to_pylist()
            texts = batch[text_col].to_pylist() if verify else None
            # within-batch first occurrence; exact mode keys on the
            # (hash, text) PAIR so an in-batch collision admits both
            keep = np.zeros(len(h), dtype=bool)
            if verify:
                first_idx: dict = {}
                for i, hv in enumerate(h.tolist()):
                    key = (hv, texts[i])
                    if key not in first_idx:
                        first_idx[key] = i
                        keep[i] = True
            else:
                _, first = np.unique(h, return_index=True)
                keep[first] = True
            cand = np.flatnonzero(keep)
            # consult each shard ONCE for this batch's candidates
            sh = (h[cand] % n_shards + n_shards) % n_shards
            refs, slots = [], []
            for s in range(n_shards):
                rows = cand[sh == s]
                if len(rows) == 0:
                    continue
                refs.append(
                    shards[s].admit.remote(
                        h[rows].tolist(),
                        [owners[i] for i in rows],
                        [texts[i] for i in rows] if verify else None,
                    )
                )
                slots.append(rows)
            admitted = np.zeros(len(h), dtype=bool)
            for rows, mask in zip(slots, ray.get(refs)):
                admitted[rows] = mask
            return batch.filter(pa.array(admitted))

        return ds.map_batches(filt, batch_format="pyarrow")
