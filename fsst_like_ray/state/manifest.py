"""Per-partition lineage manifest → resumable encode jobs (north rule:
"every partition writes lineage records ... so a killed job resumes by
skipping completed partitions").

Granularity = input FRAGMENT (one source parquet file): deterministic,
restart-safe, and maps 1:1 to an output subdirectory, so a resumed run
filters finished fragments out of the read — no mid-pipeline state needed.
Records are JSON lines under ``<out_dir>/_manifest/``; each fragment commits
atomically (write tmp + rename) after its output is fully written.
"""

from __future__ import annotations

import hashlib
import json
import os


def fragment_key(path: str) -> str:
    return hashlib.sha256(path.encode()).hexdigest()[:16]


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, frag: str) -> str:
        return os.path.join(self.dir, f"{fragment_key(frag)}.json")

    def completed(self) -> dict[str, dict]:
        out = {}
        for name in os.listdir(self.dir):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(self.dir, name)) as f:
                rec = json.load(f)
            if rec.get("status") == "done":
                out[rec["fragment"]] = rec
        return out

    def pending(self, fragments: list[str]) -> list[str]:
        done = self.completed()
        return [f for f in fragments if f not in done]

    def commit(self, record: dict) -> None:
        """Atomically record a completed fragment (input fragment, codec mix,
        state hashes, encoded bytes, rows — the lineage row)."""
        record = dict(record, status="done")
        path = self._path(record["fragment"])
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(record, f)
        os.replace(tmp, path)

    def stats(self) -> dict:
        done = self.completed()
        return {
            "fragments": len(done),
            "rows": sum(r.get("rows", 0) for r in done.values()),
            "tokens": sum(r.get("tokens", 0) for r in done.values()),
            "encoded_bytes": sum(r.get("encoded_bytes", 0) for r in done.values()),
            "plain_bytes": sum(r.get("plain_bytes", 0) for r in done.values()),
        }
