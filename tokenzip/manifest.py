"""Checkpoint / lineage manifest.

Per input fragment the manifest records: status, row/token counts, byte
counts in/out, the LEB128 oracle bytes (the north rule's <=-reference-size
bound, auditable per fragment), and the codec mix. A rerun of
``compress()`` skips fragments marked done and wipes partial chunk output
of unfinished fragments before re-encoding — exact resume with
deterministic, bit-identical re-encode (seeded/stateless encoders).

The reference has no persistence at all (pure in-memory library,
SURVEY.md §3); this layer is mandated by the north rule.
"""

from __future__ import annotations

import json
import time

from tokenzip import uio


class Manifest:
    VERSION = 2  # v2: path-hashed fragment keys (older manifests ignored)

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        # out_dir may be a scheme:// URI (multi-node storage contract,
        # tokenzip/uio.py) — all manifest IO goes through uio
        self.path = uio.join(out_dir, "manifest.json")
        self.data: dict = {"version": self.VERSION, "fragments": {}, "totals": {}}
        if uio.exists(self.path):
            loaded = json.loads(uio.read_bytes(self.path).decode())
            if loaded.get("version") == self.VERSION:
                self.data = loaded

    def done_fragments(self) -> set[str]:
        return {
            k for k, v in self.data["fragments"].items() if v.get("status") == "done"
        }

    def mark_done(self, frag: str, stats: dict) -> None:
        stats = dict(stats)
        stats["status"] = "done"
        stats["completed_at"] = time.time()
        self.data["fragments"][frag] = stats

    def totals(self) -> dict:
        keys = ("n_rows", "n_tokens", "bytes_in", "bytes_out",
                "tokens_bytes_out", "leb128_bytes", "n_chunks")
        tot = {k: 0 for k in keys}
        for v in self.data["fragments"].values():
            if v.get("status") == "done":
                for k in keys:
                    tot[k] += int(v.get(k, 0))
        return tot

    def save(self) -> None:
        self.data["totals"] = self.totals()
        uio.write_bytes_atomic(
            self.path,
            json.dumps(self.data, indent=1, sort_keys=True).encode(),
        )
