"""Paged state backend: 4 KB page pool with copy-on-write editing.

Equivalent of the reference hashdb64 PageManager
(src/hashdb64/page/page_manager.hpp:20-50): a memory- or file-backed pool
of 4 KB pages with a free list, monotonically growing capacity, and
``edit_page`` copy-on-write semantics — editing a page under an open write
generation returns a fresh shadow page; ``flush`` atomically publishes the
edited set and recycles the originals, giving root-versioned state history
(the KeyValueTree/TreeChunk layers build on this).
"""

from __future__ import annotations

import heapq
import os
import struct
import threading
from typing import Dict, List, Optional

PAGE_SIZE = 4096


class PageManager:
    def __init__(self, path: Optional[str] = None, initial_pages: int = 64):
        self._lock = threading.RLock()
        self.path = path
        if path and os.path.exists(path):
            size = os.path.getsize(path)
            self._file = open(path, "r+b")
            self.n_pages = max(size // PAGE_SIZE, initial_pages)
            # Allocation watermark persisted in a sidecar: pages below it
            # may hold live data from a previous open and must not be
            # handed out again.  A legacy file without a sidecar is treated
            # conservatively: every existing page is considered used.
            self.watermark = self._read_watermark(
                default=max(size // PAGE_SIZE, 1))
        elif path:
            self._file = open(path, "w+b")
            self.n_pages = initial_pages
            self._file.truncate(self.n_pages * PAGE_SIZE)
            self.watermark = 1
            self._save_watermark()
        else:
            self._file = None
            self.n_pages = initial_pages
            self._mem: Dict[int, bytearray] = {}
            self.watermark = 1
        # page 0 is the header and never freed; min-heap so allocation is
        # lowest-first and the watermark stays tight
        self.free_list: List[int] = list(range(self.watermark, self.n_pages))
        heapq.heapify(self.free_list)
        self.edited: Dict[int, int] = {}   # original -> shadow (open gen)

    # -- allocation-watermark persistence ---------------------------------
    def _wm_path(self) -> str:
        return self.path + ".wm"

    def _read_watermark(self, default: int) -> int:
        try:
            with open(self._wm_path(), "rb") as f:
                (wm,) = struct.unpack("<Q", f.read(8))
            return max(1, wm)
        except (OSError, struct.error):
            return default

    def _save_watermark(self):
        if not self.path:
            return
        with open(self._wm_path(), "wb") as f:
            f.write(struct.pack("<Q", self.watermark))
            f.flush()
            os.fsync(f.fileno())

    # -- raw page IO ----------------------------------------------------
    def read_page(self, idx: int) -> bytes:
        with self._lock:
            self._check(idx)
            if self._file is not None:
                self._file.seek(idx * PAGE_SIZE)
                data = self._file.read(PAGE_SIZE)
                return data.ljust(PAGE_SIZE, b"\x00")
            return bytes(self._mem.get(idx, b"\x00" * PAGE_SIZE))

    def write_page(self, idx: int, data: bytes):
        with self._lock:
            self._check(idx)
            assert len(data) <= PAGE_SIZE
            data = data.ljust(PAGE_SIZE, b"\x00")
            if self._file is not None:
                self._file.seek(idx * PAGE_SIZE)
                self._file.write(data)
            else:
                self._mem[idx] = bytearray(data)

    def _check(self, idx: int):
        if not (0 <= idx < self.n_pages):
            raise IndexError(f"page {idx} out of range (n={self.n_pages})")

    # -- allocation -----------------------------------------------------
    def get_free_page(self) -> int:
        with self._lock:
            if not self.free_list:
                self._grow()
            idx = heapq.heappop(self.free_list)
            if idx >= self.watermark:
                self.watermark = idx + 1
                self._save_watermark()
            return idx

    def release_page(self, idx: int):
        with self._lock:
            self._check(idx)
            assert idx != 0, "cannot free the header page"
            heapq.heappush(self.free_list, idx)

    def _grow(self):
        old = self.n_pages
        self.n_pages = old * 2
        if self._file is not None:
            self._file.truncate(self.n_pages * PAGE_SIZE)
        for idx in range(old, self.n_pages):
            heapq.heappush(self.free_list, idx)

    @property
    def n_free(self):
        with self._lock:
            return len(self.free_list)

    # -- copy-on-write editing ------------------------------------------
    def edit_page(self, idx: int) -> int:
        """Returns the writable shadow of `idx` for the open generation
        (allocating and copying on first edit; header page edits in place)."""
        with self._lock:
            if idx == 0:
                return 0
            if idx in self.edited:
                return self.edited[idx]
            shadow = self.get_free_page()
            self.write_page(shadow, self.read_page(idx))
            self.edited[idx] = shadow
            return shadow

    def flush(self):
        """Publish the open generation: shadows become canonical, originals
        are recycled."""
        with self._lock:
            for original in list(self.edited.keys()):
                self.release_page(original)
            self.edited.clear()
            if self._file is not None:
                self._file.flush()
                os.fsync(self._file.fileno())

    def discard(self):
        """Abort the open generation: recycle all shadows."""
        with self._lock:
            for shadow in self.edited.values():
                self.release_page(shadow)
            self.edited.clear()
