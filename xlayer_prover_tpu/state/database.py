"""Node/program store backing the SMT (reference: src/hashdb/database.cpp).

The reference uses Postgres + LRU/associative caches + write-behind threads;
state access is pointer-chasing and stays host-side by design (SURVEY §5).
This implementation provides the same interface shape
(read/write/getProgram/setProgram/flush) over pluggable backends:

  * MemoryDB — dict-backed, the default for proving and tests.
  * FileDB   — append-log + in-memory index persistence (optional).

Keys are 4-tuple Goldilocks node hashes; values are lists of 12 field
elements (8 data + 4 capacity), exactly the reference node layout.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

Key = Tuple[int, int, int, int]


class MemoryDB:
    """In-memory node/program store with write counting (for tests/metrics)."""

    def __init__(self):
        self.nodes: Dict[Key, List[int]] = {}
        self.programs: Dict[Key, bytes] = {}
        self.reads = 0
        self.writes = 0

    def read(self, key: Key) -> Optional[List[int]]:
        self.reads += 1
        return self.nodes.get(tuple(key))

    def write(self, key: Key, value: List[int]):
        self.writes += 1
        assert len(value) == 12
        self.nodes[tuple(key)] = [int(v) for v in value]

    def get_program(self, key: Key) -> Optional[bytes]:
        return self.programs.get(tuple(key))

    def set_program(self, key: Key, data: bytes):
        self.programs[tuple(key)] = bytes(data)

    def flush(self):
        pass


class FileDB(MemoryDB):
    """MemoryDB + append-only JSONL log for durability across restarts."""

    def __init__(self, path: str):
        super().__init__()
        self.path = path
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    rec = json.loads(line)
                    if rec["t"] == "n":
                        self.nodes[tuple(rec["k"])] = rec["v"]
                    else:
                        self.programs[tuple(rec["k"])] = bytes.fromhex(rec["v"])
        self._log = open(path, "a")

    def write(self, key: Key, value: List[int]):
        super().write(key, value)
        self._log.write(json.dumps({"t": "n", "k": list(key),
                                    "v": [int(v) for v in value]}) + "\n")

    def set_program(self, key: Key, data: bytes):
        super().set_program(key, data)
        self._log.write(json.dumps({"t": "p", "k": list(key),
                                    "v": data.hex()}) + "\n")

    def flush(self):
        self._log.flush()
        os.fsync(self._log.fileno())
