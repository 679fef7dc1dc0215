"""Stream-position checkpointing for resumable multi-host encode runs.

The codec is stateless, so recovery is trivial by design (SURVEY.md §5):
a manifest records, per host, how many batches have been durably consumed;
resume = re-open the input stream and skip that many batches
(:class:`..utils.io.BatchStream` ``skip=``).  Atomic write-rename keeps the
manifest consistent under crashes mid-update.
"""

from __future__ import annotations

import dataclasses
import json
import os
import tempfile
import time


@dataclasses.dataclass
class StreamPosition:
    host_id: int
    batches_done: int
    records_done: int
    updated_at: float


class Manifest:
    """JSON manifest of per-host stream positions."""

    def __init__(self, path: str | os.PathLike):
        self.path = str(path)
        self.positions: dict[int, StreamPosition] = {}
        if os.path.exists(self.path):
            self._load()

    def _load(self) -> None:
        with open(self.path) as f:
            data = json.load(f)
        self.positions = {
            int(k): StreamPosition(**v) for k, v in data["hosts"].items()
        }

    def save(self) -> None:
        # read-merge-write: on a SHARED manifest path, other hosts'
        # entries must survive this host's save (r05 review: a blind
        # rewrite dropped them, re-delivering their entire streams on
        # resume).  This host's own entries always win; merge conflicts
        # across hosts cannot occur because entries are keyed by host_id
        # and each host only ever advances its own.
        merged: dict[int, StreamPosition] = {}
        try:
            with open(self.path) as f:
                data = json.load(f)
            merged = {
                int(k): StreamPosition(**v)
                for k, v in data.get("hosts", {}).items()
            }
        except (OSError, ValueError, TypeError):
            pass  # absent or torn file: nothing to merge
        merged.update(self.positions)
        data = {
            "hosts": {
                str(k): dataclasses.asdict(v) for k, v in merged.items()
            }
        }
        d = os.path.dirname(self.path) or "."
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".manifest-")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(data, f, indent=1)
            os.replace(tmp, self.path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    def advance(self, host_id: int, batches: int = 1, records: int = 0) -> None:
        pos = self.positions.get(
            host_id, StreamPosition(host_id, 0, 0, time.time())
        )
        pos.batches_done += batches
        pos.records_done += records
        pos.updated_at = time.time()
        self.positions[host_id] = pos

    def batches_done(self, host_id: int) -> int:
        pos = self.positions.get(host_id)
        return pos.batches_done if pos else 0

    def records_done(self, host_id: int) -> int:
        pos = self.positions.get(host_id)
        return pos.records_done if pos else 0
