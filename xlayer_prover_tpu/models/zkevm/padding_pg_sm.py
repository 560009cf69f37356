"""PaddingPG SM: provable Poseidon sponge padding for the hashP chain.

TPU-native re-design of the reference PaddingPG state machine
(src/sm/padding_pg/padding_pg_executor.cpp; padding_pg.pil shape): one row
per padded byte, 56-byte blocks statically aligned to the domain
(row % 56), each block hashed by one PoseidonG permutation
(8x7-byte little-endian elements + the previous block hash as capacity —
poseidonLinearHash, utils.cpp:677-712).

Semantics per stream (= one Main hashP address):
  * ``rem = len - byte_index`` counts down; the row where it hits zero is
    the 0x01 pad byte; ``spare`` latches afterwards (pure zero padding)
    and the stream's final byte ORs 0x80 (reference rows at
    padding_pg_executor.cpp:99-105; pad layout prepareInput:38-42);
  * chunk-read registers crLen/crOffset/crV replay Main's byte accesses:
    a read of L<=32 bytes accumulates big-endian into 8x32-bit limbs and
    latches at crOffset==0, where Main's (addr, HASHPOS, D0, op) rows
    look it up (crAccI/crSh packing, padding_pg_executor.cpp:133-145);
  * at block-last rows, (acc0..7, prevHash0..3, curHash0..3) is looked up
    in the PoseidonG SM permutation table; prevHash chains curHash across
    blocks and resets at stream ends (executor.cpp:149-216);
  * idle rows are empty-data streams, one per remaining block (the
    reference's unused-block fill, executor.cpp:230-270); all idle blocks
    share one Poseidon instance (plookup multiplicity).  The domain tail
    (n % 56 rows) is fixed-inactive — blocks stay statically aligned
    instead of the reference's truncated final block.

Simplifications vs the reference column set: acc/crV accumulate INCLUSIVE
of the current row's byte (the exported values stay degree-1); curHash is
only committed at block-last rows (no in-block broadcast); lastHash
itself is the len/digest latch selector (no separate lastHashLen/
lastHashDigest flags — spurious table rows are sound under a plookup).
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from ...fields import gl
from ...native import poseidon_permute
from ...stark.air import AirBuilder, Const, FirstRowSelector

P = gl.P
BLOCK = 56          # bytes per block
EPB = 7             # bytes per element
MAX_READ = 32


@dataclasses.dataclass
class PaddingPGLayout:
    n_bits: int
    n_active: int
    fixed: dict
    witness: dict

    def pos_expr(self):
        """Start position of the latched read: len - rem - crLen + 1."""
        w = self.witness
        return w["len"] - w["rem"] - w["crLen"] + Const(1)


@dataclasses.dataclass
class PaddingPGInput:
    """One hashP stream (reference PaddingPGExecutorInput)."""
    addr: int
    data: bytes
    reads: List[int]          # read lengths partitioning the padded bytes
    len_called: bool = False
    digest_called: bool = False


def pad_bytes(data: bytes) -> bytes:
    padded = bytearray(data)
    padded.append(0x01)
    while len(padded) % BLOCK:
        padded.append(0)
    padded[-1] |= 0x80
    return bytes(padded)


def linear_hash_blocks(padded: bytes):
    """[(input12, out4) per block] of the chained sponge."""
    blocks = []
    digest = [0, 0, 0, 0]
    for off in range(0, len(padded), BLOCK):
        elems = [int.from_bytes(padded[off + EPB * k:off + EPB * (k + 1)],
                                "little") for k in range(8)]
        inp = elems + list(digest)
        digest = poseidon_permute(inp)[:4]
        blocks.append((inp, list(digest)))
    return blocks


def build(b: AirBuilder, n_bits: int) -> PaddingPGLayout:
    n = 1 << n_bits
    n_active = BLOCK * (n // BLOCK)
    assert n >= 512, "PaddingPG needs the 256-row byte table + >=1 block"

    fixed = {name: b.fixed(f"PP_{name}")
             for name in ("ACTIVE", "LAST", "LASTCH", "NLAST", "BFIRST",
                          "CRSEL", "CROFF", "BYTE")}
    for k in range(8):
        fixed[f"F{k}"] = b.fixed(f"PP_F{k}")
        fixed[f"CRFT{k}"] = b.fixed(f"PP_CRFT{k}")

    w = {}
    for name in ("freeIn", "addr", "len", "rem", "remInv", "remZero",
                 "spare", "lastHash", "incCounter", "crLen", "crOffset",
                 "crOffsetInv", "crLatch"):
        w[name] = b.witness(f"pp_{name}")
    for k in range(8):
        w[f"acc{k}"] = b.witness(f"pp_acc{k}")
        w[f"crV{k}"] = b.witness(f"pp_crV{k}")
        w[f"crF{k}"] = b.witness(f"pp_crF{k}")
    for j in range(4):
        w[f"prevHash{j}"] = b.witness(f"pp_prevHash{j}")
        w[f"curHash{j}"] = b.witness(f"pp_curHash{j}")

    one = Const(1)
    act = fixed["ACTIVE"]
    last = fixed["LAST"]        # block-last rows
    lastch = fixed["LASTCH"]    # block-last rows with an active next row
    nlast = fixed["NLAST"]      # active rows that are not block-last
    bfirst = fixed["BFIRST"]    # block-first rows
    l1 = FirstRowSelector()

    # ---- row-0 stream/read start ------------------------------------
    b.constrain(l1 * (w["rem"] - w["len"]))
    b.constrain(l1 * w["spare"])
    b.constrain(l1 * (w["incCounter"] - one))
    b.constrain(l1 * (w["crOffset"] - w["crLen"] + one))
    for j in range(4):
        b.constrain(l1 * w[f"prevHash{j}"])
    for k in range(8):
        b.constrain(l1 * (w[f"crV{k}"] - w["freeIn"] * w[f"crF{k}"]))

    # ---- helper flags ------------------------------------------------
    rem_or = w["spare"] + w["remZero"] - w["spare"] * w["remZero"]
    b.constrain(w["remZero"] * w["rem"])
    b.constrain(act * (one - w["remZero"])
                * (one - w["rem"] * w["remInv"]))
    b.constrain(w["spare"] * (one - w["spare"]))
    b.constrain(w["lastHash"] - last * rem_or)
    b.constrain(w["crLatch"] * w["crOffset"])
    b.constrain(act * (one - w["crLatch"])
                * (one - w["crOffset"] * w["crOffsetInv"]))
    b.constrain((one - act) * w["crLatch"])
    # stream ends only on a read boundary
    b.constrain(w["lastHash"] * (one - w["crLatch"]))

    # ---- byte + padding rules ---------------------------------------
    b.plookup([w["freeIn"]], [fixed["BYTE"]])
    pad80 = Const(0x80) * w["lastHash"]
    b.constrain(act * w["remZero"] * (one - w["spare"])
                * (w["freeIn"] - one - pad80))
    b.constrain(w["spare"] * (w["freeIn"] - pad80))

    # ---- 7-byte element accumulation (acc inclusive of this byte) ----
    for k in range(8):
        b.constrain(bfirst * (w[f"acc{k}"] - w["freeIn"] * fixed[f"F{k}"]))
        b.constrain(nlast * (w[f"acc{k}"].shifted() - w[f"acc{k}"]
                             - w["freeIn"].shifted()
                             * fixed[f"F{k}"].shifted()))

    # ---- chunk-read registers ---------------------------------------
    # (crOffset, crF0..7) bound to the 32-row shift table; crOffset < 32
    b.plookup([w["crOffset"]] + [w[f"crF{k}"] for k in range(8)],
              [fixed["CROFF"]] + [fixed[f"CRFT{k}"] for k in range(8)],
              f_sel=act, t_sel=fixed["CRSEL"])
    # transitions run on every active row with an active successor
    # (nlast rows always have one; block-last rows need LASTCH)
    chg = nlast + lastch
    b.constrain(chg * (one - w["crLatch"])
                * (w["crOffset"].shifted() - w["crOffset"] + one))
    b.constrain(chg * w["crLatch"]
                * (w["crOffset"].shifted() - w["crLen"].shifted() + one))
    b.constrain(chg * (one - w["crLatch"])
                * (w["crLen"].shifted() - w["crLen"]))
    for k in range(8):
        b.constrain(chg * w["crLatch"]
                    * (w[f"crV{k}"].shifted() - w["freeIn"].shifted()
                       * w[f"crF{k}"].shifted()))
        b.constrain(chg * (one - w["crLatch"])
                    * (w[f"crV{k}"].shifted() - w[f"crV{k}"]
                       - w["freeIn"].shifted()
                       * w[f"crF{k}"].shifted()))

    # ---- stream registers -------------------------------------------
    # within a block (nlast): everything advances one byte
    b.constrain(nlast * (w["rem"].shifted() - w["rem"] + one))
    b.constrain(nlast * (w["len"].shifted() - w["len"]))
    b.constrain(nlast * (w["addr"].shifted() - w["addr"]))
    b.constrain(nlast * (w["spare"].shifted() - rem_or))
    b.constrain(nlast * (w["incCounter"].shifted() - w["incCounter"]))
    for j in range(4):
        b.constrain(nlast * (w[f"prevHash{j}"].shifted()
                             - w[f"prevHash{j}"]))

    # across a block boundary (lastch): stream end resets, else chains
    lh = w["lastHash"]
    b.constrain(lastch * (w["rem"].shifted() - lh * w["len"].shifted()
                          - (one - lh) * (w["rem"] - one)))
    b.constrain(lastch * (one - lh) * (w["len"].shifted() - w["len"]))
    b.constrain(lastch * (w["addr"].shifted() - w["addr"] - lh))
    b.constrain(lastch * (w["spare"].shifted() - (one - lh) * rem_or))
    b.constrain(lastch * (w["incCounter"].shifted() - one
                          - (one - lh) * w["incCounter"]))
    for j in range(4):
        b.constrain(lastch * (w[f"prevHash{j}"].shifted()
                              - (one - lh) * w[f"curHash{j}"]))

    return PaddingPGLayout(n_bits=n_bits, n_active=n_active, fixed=fixed,
                           witness=w)


def poseidon_lookup_cols(layout: PaddingPGLayout):
    """(f_cols, f_sel) of the block -> PoseidonG permutation lookup."""
    w = layout.witness
    f_cols = ([w[f"acc{k}"] for k in range(8)]
              + [w[f"prevHash{j}"] for j in range(4)]
              + [w[f"curHash{j}"] for j in range(4)])
    return f_cols, layout.fixed["LAST"]


def fill_fixed(layout: PaddingPGLayout, const_np: np.ndarray):
    n = const_np.shape[0]
    na = layout.n_active
    fx = layout.fixed
    r = np.arange(n)
    in_block = r % BLOCK
    active = (r < na).astype(np.uint64)
    const_np[:, fx["ACTIVE"].index] = active
    last = ((in_block == BLOCK - 1) & (r < na)).astype(np.uint64)
    const_np[:, fx["LAST"].index] = last
    const_np[:, fx["LASTCH"].index] = last * (r + 1 < na)
    const_np[:, fx["NLAST"].index] = active * (in_block != BLOCK - 1)
    const_np[:, fx["BFIRST"].index] = active * (in_block == 0)
    # acc shift factors: element in_block//7, byte (in_block%7) LE
    acci = in_block // EPB
    sh = (in_block % EPB) * 8
    for k in range(8):
        const_np[:, fx[f"F{k}"].index] = \
            np.where((acci == k) & (active == 1),
                     np.uint64(1) << sh.astype(np.uint64), 0)
    # 32-row chunk-read shift table: limb crOffset//4, shift (crOffset%4)*8
    off = np.arange(MAX_READ)
    const_np[:MAX_READ, fx["CRSEL"].index] = 1
    const_np[:MAX_READ, fx["CROFF"].index] = off
    for k in range(8):
        const_np[:MAX_READ, fx[f"CRFT{k}"].index] = \
            np.where(off // 4 == k,
                     np.uint64(1) << ((off % 4) * 8).astype(np.uint64), 0)
    const_np[:256, fx["BYTE"].index] = np.arange(256)


def expand_into(layout: PaddingPGLayout, inputs: List[PaddingPGInput],
                cm1_np: np.ndarray):
    """Fill committed columns; returns the PoseidonG request list
    (12-element inputs, deduped idle block last)."""
    n = cm1_np.shape[0]
    na = layout.n_active
    w = layout.witness
    inputs = sorted(inputs, key=lambda s: s.addr)
    if inputs:
        base = inputs[0].addr
        assert [s.addr for s in inputs] == \
            list(range(base, base + len(inputs))), \
            "hashP stream addresses must be contiguous"
        next_addr = base + len(inputs)
    else:
        next_addr = 0

    pg_requests = []
    idle_blocks = linear_hash_blocks(pad_bytes(b""))
    col = {name: c.index for name, c in w.items()}
    row = 0

    def put_stream(addr, data, reads, record_pg):
        nonlocal row
        padded = pad_bytes(data)
        blocks = linear_hash_blocks(padded)
        if record_pg:
            pg_requests.extend(inp for inp, _ in blocks)
        ln = len(data)
        # extend the read partition over the padding bytes (singletons)
        reads = list(reads) + [1] * (len(padded) - sum(reads))
        assert sum(reads) == len(padded), "reads overrun the padded stream"
        r_i = 0
        cr_off = reads[0] - 1
        cr_len = reads[0]
        cr_v = [0] * 8
        for j, byte in enumerate(padded):
            rr = row + j
            blk = j // BLOCK
            cm1_np[rr, col["freeIn"]] = byte
            cm1_np[rr, col["addr"]] = addr
            cm1_np[rr, col["len"]] = ln
            rem = (ln - j) % P
            cm1_np[rr, col["rem"]] = rem
            if rem:
                cm1_np[rr, col["remInv"]] = gl.host_inv(rem)
            else:
                cm1_np[rr, col["remZero"]] = 1
            cm1_np[rr, col["spare"]] = 1 if j > ln else 0
            is_last_byte = j == len(padded) - 1
            if j % BLOCK == BLOCK - 1:
                inp, out = blocks[blk]
                for k in range(8):
                    cm1_np[rr, col[f"acc{k}"]] = inp[k]
                for q in range(4):
                    cm1_np[rr, col[f"curHash{q}"]] = out[q]
                if is_last_byte:
                    cm1_np[rr, col["lastHash"]] = 1
            for q in range(4):
                cm1_np[rr, col[f"prevHash{q}"]] = \
                    blocks[blk - 1][1][q] if blk else 0
            cm1_np[rr, col["incCounter"]] = blk + 1
            # inclusive element accumulator
            acci, shv = (j % BLOCK) // EPB, 8 * ((j % BLOCK) % EPB)
            if j % BLOCK != BLOCK - 1:
                base_off = (j // BLOCK) * BLOCK
                for k in range(8):
                    lo = base_off + EPB * k
                    span = min(j + 1 - lo, EPB) if j + 1 > lo else 0
                    if span > 0:
                        cm1_np[rr, col[f"acc{k}"]] = int.from_bytes(
                            padded[lo:lo + span], "little")
            # chunk-read registers (inclusive)
            limb, csh = cr_off // 4, 8 * (cr_off % 4)
            cr_v[limb] += byte << csh
            cm1_np[rr, col["crLen"]] = cr_len
            cm1_np[rr, col["crOffset"]] = cr_off
            if cr_off:
                cm1_np[rr, col["crOffsetInv"]] = gl.host_inv(cr_off)
            cm1_np[rr, col[f"crF{limb}"]] = 1 << csh
            for k in range(8):
                cm1_np[rr, col[f"crV{k}"]] = cr_v[k]
            if cr_off == 0:
                cm1_np[rr, col["crLatch"]] = 1
                r_i += 1
                if r_i < len(reads):
                    cr_len = reads[r_i]
                    cr_off = cr_len - 1
                    cr_v = [0] * 8
            else:
                cr_off -= 1
        row += len(padded)

    for s in inputs:
        assert row + len(pad_bytes(s.data)) <= na, \
            "PaddingPG byte capacity exceeded"
        put_stream(s.addr, s.data, s.reads, record_pg=True)

    first_idle = True
    while row < na:
        put_stream(next_addr, b"", [], record_pg=first_idle)
        first_idle = False
        next_addr += 1
    return pg_requests
