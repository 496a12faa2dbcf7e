"""Per-partition lineage manifest + resume (north_rule requirement).

Nothing in batch Spark gives checkpoint/resume across job restarts; this is
the one piece of custom orchestration (SURVEY.md §4). Unit of work = one
day partition of the pages table (the same granularity the reference scans,
one date dir per search, zeek_search_params.rs:59-74). For each completed
(stage, day) the manifest records an input fingerprint plus row/byte
metrics. A restarted run skips units whose fingerprint matches; a changed
input invalidates just that unit.

Atomicity: the manifest entry is written via tmp-file + os.replace (atomic
on POSIX) and only AFTER the sink write commits; sink writes are idempotent
overwrite-by-partition. So a kill between sink commit and manifest commit
re-does at most one unit, never corrupts one. (With Iceberg, snapshot
commits give the same story table-natively.)
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass


@dataclass
class UnitResult:
    rows_in: int
    rows_out: int
    bytes_out: int


class Manifest:
    def __init__(self, manifest_dir: str):
        self.dir = manifest_dir
        os.makedirs(manifest_dir, exist_ok=True)

    def _path(self, stage: str, unit: str) -> str:
        return os.path.join(self.dir, f"{stage}__{unit}.json")

    def is_done(self, stage: str, unit: str, fingerprint: str) -> bool:
        p = self._path(stage, unit)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                rec = json.load(f)
            return rec.get("fingerprint") == fingerprint and rec.get("status") == "done"
        except (json.JSONDecodeError, OSError):
            return False  # torn write -> treat as not done, unit re-runs

    def mark_done(
        self, stage: str, unit: str, fingerprint: str, metrics: UnitResult
    ) -> None:
        rec = {
            "stage": stage,
            "unit": unit,
            "fingerprint": fingerprint,
            "status": "done",
            "rows_in": metrics.rows_in,
            "rows_out": metrics.rows_out,
            "bytes_out": metrics.bytes_out,
        }
        tmp = self._path(stage, unit) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, self._path(stage, unit))

    def entries(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    out.append(json.load(f))
        return out


def dir_fingerprint(path: str) -> str:
    """Cheap input fingerprint: sorted (name, size, mtime_ns) of data files.
    On Iceberg this would be the snapshot id."""
    items = []
    for root, _dirs, files in os.walk(path):
        for fn in sorted(files):
            if fn.startswith(("_", ".")):
                continue
            st = os.stat(os.path.join(root, fn))
            items.append((os.path.relpath(os.path.join(root, fn), path), st.st_size, st.st_mtime_ns))
    import hashlib

    return hashlib.sha256(json.dumps(items, sort_keys=True).encode()).hexdigest()[:16]


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if not fn.startswith(("_", ".")):
                total += os.stat(os.path.join(root, fn)).st_size
    return total
