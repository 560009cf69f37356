"""Versioned 64-ary key-value tree over the paged backend.

Equivalent of the reference hashdb64 KeyValueTree/LevelTree + root-version
pages (src/hashdb64/key_value_tree.hpp:12, level_tree.hpp, page/
root_version_page.hpp; data model in SURVEY A.6): 256-bit keys descend 6
bits per level (64 children per chunk, the TreeChunk fan-out), leaves
hold packed (key, value) entries, and every write generation publishes a
new root page while prior roots stay readable — kvDBMaxVersions-style
history with copy-on-write paths.

Page layout (4 KB pages, PAGE_SIZE from page_manager):
  * node page:  64 x u64 child slots; 0 = empty, else (page << 1) | leaf
  * leaf page:  u16 count + count x 64-byte (key32 | value32) entries
  * page 0:     root-version directory (u16 count + (u64 version,
                u64 root_page) records), persisted on flush
"""

from __future__ import annotations

import struct
from typing import Dict, Optional

from .page_manager import PAGE_SIZE, PageManager

FANOUT = 64
LEVEL_BITS = 6
LEAF_CAP = (PAGE_SIZE - 2) // 64
MAX_LEVELS = 256 // LEVEL_BITS + 1


def _nibble(key: int, level: int) -> int:
    shift = 256 - LEVEL_BITS * (level + 1)
    if shift < 0:
        return (key << -shift) & (FANOUT - 1)
    return (key >> shift) & (FANOUT - 1)


class KeyValueTree:
    """write(version, key, value) / read(version, key): version history
    with COW paths (old versions stay readable until pruned)."""

    def __init__(self, pm: Optional[PageManager] = None):
        self.pm = pm if pm is not None else PageManager()
        self.versions: Dict[int, int] = {}
        self.latest_version = 0
        if self.pm.n_pages > 0:
            self._load_directory()

    # -- root-version directory (page 0) --------------------------------
    def _load_directory(self):
        try:
            raw = self.pm.read_page(0)
        except Exception:  # noqa: BLE001 - fresh pool
            return
        (count,) = struct.unpack_from("<H", raw, 0)
        if count == 0 or count > (PAGE_SIZE - 2) // 16:
            return
        for i in range(count):
            v, root = struct.unpack_from("<QQ", raw, 2 + 16 * i)
            self.versions[v] = root
            self.latest_version = max(self.latest_version, v)

    def _save_directory(self):
        items = sorted(self.versions.items())[-(PAGE_SIZE - 2) // 16:]
        raw = bytearray(PAGE_SIZE)
        struct.pack_into("<H", raw, 0, len(items))
        for i, (v, root) in enumerate(items):
            struct.pack_into("<QQ", raw, 2 + 16 * i, v, root)
        self.pm.write_page(0, bytes(raw))

    # -- page codecs ------------------------------------------------------
    def _new_leaf(self, entries) -> int:
        idx = self.pm.get_free_page()
        raw = bytearray(PAGE_SIZE)
        struct.pack_into("<H", raw, 0, len(entries))
        for i, (k, v) in enumerate(entries):
            raw[2 + 64 * i:2 + 64 * i + 32] = k.to_bytes(32, "big")
            raw[2 + 64 * i + 32:2 + 64 * i + 64] = v.to_bytes(32, "big")
        raw[PAGE_SIZE - 1] = 0xAB          # leaf marker (root disambiguation)
        self.pm.write_page(idx, bytes(raw))
        return idx

    def _leaf_entries(self, idx: int):
        raw = self.pm.read_page(idx)
        (count,) = struct.unpack_from("<H", raw, 0)
        out = []
        for i in range(count):
            k = int.from_bytes(raw[2 + 64 * i:2 + 64 * i + 32], "big")
            v = int.from_bytes(raw[2 + 64 * i + 32:2 + 64 * i + 64], "big")
            out.append((k, v))
        return out

    def _new_node(self, slots) -> int:
        idx = self.pm.get_free_page()
        self.pm.write_page(idx, struct.pack("<64Q", *slots))
        return idx

    def _node_slots(self, idx: int):
        raw = self.pm.read_page(idx)
        return list(struct.unpack_from("<64Q", raw, 0))

    # -- operations -------------------------------------------------------
    def write(self, version: int, key: int, value: int):
        """Write under a version generation (>= latest); the prior
        version's tree stays intact (COW path)."""
        assert version >= self.latest_version, "versions are monotonic"
        base_root = self.versions.get(self.latest_version)
        if version not in self.versions:
            self.versions[version] = base_root if base_root is not None \
                else self._new_leaf([])
        self.latest_version = max(self.latest_version, version)
        root = self.versions[version]
        self.versions[version] = self._insert(root, key, value, 0)

    def _insert(self, page: int, key: int, value: int, level: int) -> int:
        """Returns the new page index for this subtree (COW)."""
        if page is None:
            return self._new_leaf([(key, value)])
        # leaf pages are tagged in parent slots; at the root we probe
        raw_is_leaf = self._is_leaf_probe(page)
        if raw_is_leaf:
            entries = dict(self._leaf_entries(page))
            entries[key] = value
            if len(entries) <= LEAF_CAP:
                return self._new_leaf(sorted(entries.items()))
            return self._build_subtree(list(entries.items()), level) >> 1
        slots = self._node_slots(page)
        nib = _nibble(key, level)
        slot = slots[nib]
        if slot == 0:
            child = self._new_leaf([(key, value)])
            slots[nib] = (child << 1) | 1
        else:
            child_page = slot >> 1
            is_leaf = slot & 1
            if is_leaf:
                new_child = self._insert_leaf_tagged(child_page, key, value,
                                                     level + 1)
            else:
                new_child = (self._insert(child_page, key, value,
                                          level + 1) << 1)
            slots[nib] = new_child
        return self._new_node(slots)

    def _insert_leaf_tagged(self, leaf: int, key: int, value: int,
                            level: int) -> int:
        entries = dict(self._leaf_entries(leaf))
        entries[key] = value
        return self._build_subtree(list(entries.items()), level)

    def _build_subtree(self, entries, level: int) -> int:
        """Pack entries into a subtree at `level`; returns a tagged slot
        (recursing while a nibble group still overflows a leaf)."""
        if len(entries) <= LEAF_CAP or level >= MAX_LEVELS - 1:
            assert len(entries) <= LEAF_CAP, "duplicate-key overflow"
            return (self._new_leaf(sorted(entries)) << 1) | 1
        groups: Dict[int, list] = {}
        for k, v in entries:
            groups.setdefault(_nibble(k, level), []).append((k, v))
        slots = [0] * FANOUT
        for nib, group in groups.items():
            slots[nib] = self._build_subtree(group, level + 1)
        return self._new_node(slots) << 1

    def _is_leaf_probe(self, page: int) -> bool:
        """Roots are untagged; distinguish by the leaf count header being
        consistent (node pages hold 64 u64 slots whose low bytes collide
        with large counts only when slot0 is a tagged pointer)."""
        raw = self.pm.read_page(page)
        (count,) = struct.unpack_from("<H", raw, 0)
        if count > LEAF_CAP:
            return False
        # node pages would need slot0's low 16 bits <= LEAF_CAP AND a
        # plausible entry; disambiguate by a marker byte at the page end
        return raw[PAGE_SIZE - 1] == 0xAB

    def _new_leaf_marked(self, entries) -> int:   # pragma: no cover
        return self._new_leaf(entries)

    def read(self, version: int, key: int) -> Optional[int]:
        root = self.versions.get(version)
        if root is None:
            # read at any version >= a published one sees the latest <= it
            cands = [v for v in self.versions if v <= version]
            if not cands:
                return None
            root = self.versions[max(cands)]
        page, is_leaf, level = root, self._is_leaf_probe(root), 0
        while True:
            if is_leaf:
                for k, v in self._leaf_entries(page):
                    if k == key:
                        return v
                return None
            slots = self._node_slots(page)
            slot = slots[_nibble(key, level)]
            if slot == 0:
                return None
            page, is_leaf = slot >> 1, bool(slot & 1)
            level += 1

    def flush(self):
        self._save_directory()
        self.pm.flush()
