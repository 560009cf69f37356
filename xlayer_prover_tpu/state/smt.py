"""Sparse Merkle tree over Goldilocks quads (reference: src/hashdb/smt.cpp).

Semantics mirror the reference exactly:
  * keys are 4 Goldilocks elements; the 256 path bits interleave the limbs
    (bit i of the path = bit (i>>2) of limb (i&3)), per
    src/utils/key_utils.cpp splitKey.
  * a leaf stores (rkey, valueHash) hashed with capacity 1; valueHash =
    H0(value split into 8 x 32-bit limbs); branch nodes hash
    (left||right) with capacity 0 (smt.hpp:42-80).
  * the node store maps hash -> the 12 hashed elements, so node type is
    recoverable from the capacity part.
  * set() handles update, insert (chain of branches down to the first
    divergent bit), and delete with single-leaf collapse; zero root is the
    empty tree.

Host-side by design: state access is pointer-chasing + DB I/O (SURVEY §5);
the heavy Poseidon work for *proving* storage ops happens in the Storage SM
trace on device, not here.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

from ..fields import gl
from ..native import poseidon_permute as _permute

P = gl.P
ZERO4 = (0, 0, 0, 0)


def split_key(key) -> List[int]:
    """256 path bits in SMT order (interleaved limbs)."""
    bits = []
    for i in range(64):
        for j in range(4):
            bits.append((int(key[j]) >> i) & 1)
    return bits


def join_key(used_bits: List[int], rkey) -> Tuple[int, int, int, int]:
    """Prepend used_bits (in SMT order) back onto a remaining key."""
    n = [0, 0, 0, 0]
    accs = [0, 0, 0, 0]
    for i, b in enumerate(used_bits):
        if b:
            accs[i % 4] |= 1 << (i // 4)
        n[i % 4] += 1
    out = []
    for j in range(4):
        out.append(((int(rkey[j]) << n[j]) | accs[j]) & ((1 << 64) - 1))
        assert out[j] < P
    return tuple(out)


def remove_key_bits(key, n_bits: int) -> Tuple[int, int, int, int]:
    """Drop the first n_bits (SMT order) from the key."""
    full = n_bits // 4
    out = []
    for j in range(4):
        n = full + (1 if j < n_bits % 4 else 0)
        out.append(int(key[j]) >> n)
    return tuple(out)


def value_to_fea8(value: int) -> List[int]:
    """256-bit scalar -> 8 x 32-bit field elements (scalar2fea)."""
    return [(value >> (32 * i)) & 0xFFFFFFFF for i in range(8)]


def fea8_to_value(fea) -> int:
    v = 0
    for i in range(8):
        v |= int(fea[i]) << (32 * i)
    return v


def hash_node(data8, capacity4) -> Tuple[int, int, int, int]:
    return tuple(_permute(list(data8) + list(capacity4))[:4])


@dataclasses.dataclass
class SmtSetResult:
    old_root: tuple
    new_root: tuple
    key: tuple
    siblings: dict          # level -> the 12 sibling-node elements
    ins_key: Optional[tuple]
    ins_value: int
    is_old0: bool
    old_value: int
    new_value: int
    mode: str


@dataclasses.dataclass
class SmtGetResult:
    root: tuple
    key: tuple
    value: int
    found: bool
    siblings: dict
    ins_key: Optional[tuple]
    ins_value: int
    is_old0: bool


class Smt:
    """Reference-semantics SMT over a database.py-style node store."""

    def __init__(self, db):
        self.db = db

    # -- internals -------------------------------------------------------
    def _read(self, hash4):
        node = self.db.read(tuple(hash4))
        if node is None:
            raise KeyError(f"SMT node not found: {hash4}")
        return node

    def _is_leaf(self, node12) -> bool:
        return node12[8] == 1

    def _save(self, data8, capacity4):
        h = hash_node(data8, capacity4)
        self.db.write(h, list(data8) + list(capacity4))
        return h

    def _save_leaf(self, rkey, value: int):
        value_hash = self._save(value_to_fea8(value), ZERO4)
        return self._save(list(rkey) + list(value_hash), (1, 0, 0, 0))

    def _save_branch(self, left4, right4):
        return self._save(list(left4) + list(right4), ZERO4)

    # -- public API ------------------------------------------------------
    def get(self, root, key) -> SmtGetResult:
        root = tuple(int(v) for v in root)
        key = tuple(int(v) for v in key)
        bits = split_key(key)
        siblings = {}
        r = root
        level = 0
        # walk down while intermediate
        while r != ZERO4:
            node = self._read(r)
            siblings[level] = node
            if self._is_leaf(node):
                leaf_rkey = tuple(node[0:4])
                value_hash = tuple(node[4:8])
                value = fea8_to_value(self._read(value_hash)[0:8])
                rem_key = remove_key_bits(key, level)
                if leaf_rkey == rem_key:
                    return SmtGetResult(root=root, key=key, value=value,
                                        found=True, siblings=siblings,
                                        ins_key=None, ins_value=0,
                                        is_old0=False)
                ins_key = join_key(bits[:level], leaf_rkey)
                return SmtGetResult(root=root, key=key, value=0, found=False,
                                    siblings=siblings, ins_key=ins_key,
                                    ins_value=value, is_old0=False)
            r = tuple(node[4:8]) if bits[level] else tuple(node[0:4])
            level += 1
        return SmtGetResult(root=root, key=key, value=0, found=False,
                            siblings=siblings, ins_key=None, ins_value=0,
                            is_old0=True)

    def set(self, old_root, key, value: int) -> SmtSetResult:
        old_root = tuple(int(v) for v in old_root)
        key = tuple(int(v) for v in key)
        value = int(value)
        bits = split_key(key)

        # walk down recording the path
        path = []  # (node_hash, node12, bit) for each branch traversed
        r = old_root
        level = 0
        leaf = None  # (level, rkey, value)
        while r != ZERO4:
            node = self._read(r)
            if self._is_leaf(node):
                leaf_rkey = tuple(node[0:4])
                leaf_value = fea8_to_value(self._read(tuple(node[4:8]))[0:8])
                leaf = (level, leaf_rkey, leaf_value)
                break
            path.append((r, node, bits[level]))
            r = tuple(node[4:8]) if bits[level] else tuple(node[0:4])
            level += 1

        mode = ""
        old_value = 0
        ins_key = None
        ins_value = 0
        is_old0 = True

        if leaf is not None:
            leaf_level, leaf_rkey, leaf_value = leaf
            rem_key = remove_key_bits(key, leaf_level)
            if leaf_rkey == rem_key:
                old_value = leaf_value
                is_old0 = False
                if value != 0:
                    mode = "update"
                    new_node = self._save_leaf(rem_key, value)
                else:
                    mode = "deleteFound" if path else "deleteLast"
                    new_node = None  # delete handled below
            else:
                ins_key = join_key(bits[:leaf_level], leaf_rkey)
                ins_value = leaf_value
                if value != 0:
                    mode = "insertFound"
                    # diverge: find first differing bit at >= leaf_level
                    leaf_bits = split_key(ins_key)
                    lvl = leaf_level
                    while bits[lvl] == leaf_bits[lvl]:
                        lvl += 1
                    new_leaf = self._save_leaf(remove_key_bits(key, lvl + 1),
                                               value)
                    old_leaf = self._save_leaf(
                        remove_key_bits(ins_key, lvl + 1), ins_value)
                    if bits[lvl]:
                        branch = self._save_branch(old_leaf, new_leaf)
                    else:
                        branch = self._save_branch(new_leaf, old_leaf)
                    # chain of single-child branches from leaf_level to lvl
                    for l in range(lvl - 1, leaf_level - 1, -1):
                        if bits[l]:
                            branch = self._save_branch(ZERO4, branch)
                        else:
                            branch = self._save_branch(branch, ZERO4)
                    new_node = branch
                else:
                    mode = "zeroToZero"
                    new_node = None
        else:
            if value != 0:
                mode = "insertNotFound"
                new_node = self._save_leaf(remove_key_bits(key, level), value)
            else:
                mode = "zeroToZero"
                new_node = None

        # -- recompute the path upward -----------------------------------
        if mode in ("deleteFound", "deleteLast"):
            new_root = self._delete_and_collapse(path, bits, key)
        elif mode == "zeroToZero":
            new_root = old_root
        else:
            new_root = self._rehash_path(path, new_node)

        siblings = {lvl: node for lvl, (_, node, _) in enumerate(path)}
        return SmtSetResult(old_root=old_root, new_root=new_root, key=key,
                            siblings=siblings, ins_key=ins_key,
                            ins_value=ins_value, is_old0=is_old0,
                            old_value=old_value, new_value=value, mode=mode)

    # -- helpers ---------------------------------------------------------
    def _rehash_path(self, path, new_child):
        cur = new_child if new_child is not None else ZERO4
        for (_, node, bit) in reversed(path):
            left = tuple(node[0:4])
            right = tuple(node[4:8])
            if bit:
                right = cur
            else:
                left = cur
            cur = self._save_branch(left, right)
        return cur

    def _delete_and_collapse(self, path, bits, key):
        """Remove the leaf; collapse lone-leaf siblings upward."""
        if not path:
            return ZERO4  # deleteLast: tree becomes empty
        # replace deleted child with zero, then walk up collapsing
        cur = ZERO4
        cur_is_leaf_chain = None  # (rkey_bits_consumed_level, rkey, value)
        for lvl in range(len(path) - 1, -1, -1):
            (_, node, bit) = path[lvl]
            sib = tuple(node[0:4]) if bit else tuple(node[4:8])
            if cur == ZERO4 and cur_is_leaf_chain is None:
                # the deleted side is empty; examine the sibling
                if sib == ZERO4:
                    cur = ZERO4  # still empty, keep collapsing
                    continue
                sib_node = self._read(sib)
                if self._is_leaf(sib_node):
                    # sibling leaf moves up: its rkey grows by one bit
                    sib_rkey = tuple(sib_node[0:4])
                    sib_value = fea8_to_value(
                        self._read(tuple(sib_node[4:8]))[0:8])
                    full_key = join_key(
                        split_key(key)[:lvl] + [0 if bit else 1], sib_rkey)
                    cur_is_leaf_chain = (lvl, full_key, sib_value)
                    continue
                # sibling is a branch: keep structure with zero child
                if bit:
                    cur = self._save_branch(sib, ZERO4)
                else:
                    cur = self._save_branch(ZERO4, sib)
                continue
            if cur_is_leaf_chain is not None:
                lvl_c, full_key, sib_value = cur_is_leaf_chain
                if sib == ZERO4:
                    continue  # leaf keeps floating up
                # place the leaf here as the child at this level
                leaf_h = self._save_leaf(remove_key_bits(full_key, lvl + 1),
                                         sib_value)
                leaf_bit = split_key(full_key)[lvl]
                other = sib
                if leaf_bit:
                    cur = self._save_branch(other, leaf_h)
                else:
                    cur = self._save_branch(leaf_h, other)
                cur_is_leaf_chain = None
                continue
            # normal rehash upward
            left = tuple(node[0:4])
            right = tuple(node[4:8])
            if bit:
                right = cur
            else:
                left = cur
            cur = self._save_branch(left, right)
        if cur_is_leaf_chain is not None:
            lvl_c, full_key, sib_value = cur_is_leaf_chain
            return self._save_leaf(full_key, sib_value)
        return cur
