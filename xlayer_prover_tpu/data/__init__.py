"""Vendored protocol artifacts: ROM bundles + micro-ROMs.

The reference distributes its runtime artifacts as a ~75 GB archive
(tools/download_archive.sh, README.md:44-50); the protocol-defining
subset this framework needs — the zkASM main ROM per fork and the
storage-SM micro-ROM — is small enough (sub-MB gzipped each) to vendor
as package data with pinned checksums (tools/vendor_artifacts.py
refreshes them from a reference checkout).

Resolution order for every artifact:
  1. $XLAYER_ROM_DIR/<name>             (operator override)
  2. packaged data/roms/<name>.gz       (vendored bundle)
  3. the reference checkout             (development fallback)
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os

_DATA_DIR = os.path.join(os.path.dirname(__file__), "roms")
_REF_MAIN = "/root/reference/src/main_sm"
_REF_STORAGE = "/root/reference/config/scripts/storage_sm_rom.json"


def _manifest() -> dict:
    path = os.path.join(_DATA_DIR, "MANIFEST.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def _load_vendored(name: str):
    """Returns the parsed JSON for a vendored artifact, checksum-verified
    against the manifest; None when not vendored."""
    gz = os.path.join(_DATA_DIR, name + ".gz")
    if not os.path.exists(gz):
        return None
    with gzip.open(gz, "rb") as f:
        raw = f.read()
    want = _manifest().get(name, {}).get("sha256")
    if want is not None:
        got = hashlib.sha256(raw).hexdigest()
        if got != want:
            raise RuntimeError(
                f"vendored artifact {name} checksum mismatch: "
                f"{got} != {want}")
    return json.loads(raw)


def load_rom_json(fork_id: int):
    """Parsed rom.json for a fork, or None when unavailable."""
    override = os.environ.get("XLAYER_ROM_DIR")
    if override:
        p = os.path.join(override, f"fork_{fork_id}.rom.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
    vendored = _load_vendored(f"fork_{fork_id}.rom.json")
    if vendored is not None:
        return vendored
    ref = os.path.join(_REF_MAIN, f"fork_{fork_id}", "scripts", "rom.json")
    if os.path.exists(ref):
        with open(ref) as f:
            return json.load(f)
    return None


def has_rom(fork_id: int) -> bool:
    override = os.environ.get("XLAYER_ROM_DIR")
    if override and os.path.exists(
            os.path.join(override, f"fork_{fork_id}.rom.json")):
        return True
    if os.path.exists(os.path.join(_DATA_DIR,
                                   f"fork_{fork_id}.rom.json.gz")):
        return True
    return os.path.exists(os.path.join(_REF_MAIN, f"fork_{fork_id}",
                                       "scripts", "rom.json"))


def load_storage_rom_json():
    """Parsed storage_sm_rom.json (the Storage SM micro-ROM)."""
    override = os.environ.get("XLAYER_ROM_DIR")
    if override:
        p = os.path.join(override, "storage_sm_rom.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
    vendored = _load_vendored("storage_sm_rom.json")
    if vendored is not None:
        return vendored
    if os.path.exists(_REF_STORAGE):
        with open(_REF_STORAGE) as f:
            return json.load(f)
    return None
