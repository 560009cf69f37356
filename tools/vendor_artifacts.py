"""Vendor the protocol ROM bundles from a reference checkout.

Copies rom.json for every fork plus the storage-SM micro-ROM into
xlayer_prover_tpu/data/roms/ as gzipped JSON with sha256 checksums
pinned in MANIFEST.json (xlayer_prover_tpu.data verifies on load).

Usage: python tools/vendor_artifacts.py [--reference /root/reference]
"""

import argparse
import gzip
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "xlayer_prover_tpu", "data", "roms")


def vendor(src_path: str, name: str, manifest: dict):
    with open(src_path, "rb") as f:
        raw = f.read()
    json.loads(raw)          # must be valid JSON
    # normalize whitespace so the vendored blob is stable + small
    canon = json.dumps(json.loads(raw), separators=(",", ":"),
                       sort_keys=False).encode()
    gz = os.path.join(OUT, name + ".gz")
    with open(gz, "wb") as fh:
        with gzip.GzipFile(fileobj=fh, mode="wb", compresslevel=9,
                           mtime=0) as f:
            f.write(canon)
    manifest[name] = {"sha256": hashlib.sha256(canon).hexdigest(),
                      "bytes": len(canon)}
    print(f"vendored {name}: {len(canon)} B -> "
          f"{os.path.getsize(gz)} B gz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)
    manifest = {}
    for fork in range(1, 10):
        src = os.path.join(args.reference, "src", "main_sm",
                           f"fork_{fork}", "scripts", "rom.json")
        if os.path.exists(src):
            vendor(src, f"fork_{fork}.rom.json", manifest)
    storage = os.path.join(args.reference, "config", "scripts",
                           "storage_sm_rom.json")
    if os.path.exists(storage):
        vendor(storage, "storage_sm_rom.json", manifest)
    with open(os.path.join(OUT, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"manifest: {len(manifest)} artifacts")


if __name__ == "__main__":
    main()
