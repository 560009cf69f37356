"""HashDB gRPC service over localhost: remote client drives the SMT."""

from xlayer_prover_tpu.services.hashdb_service import (HashDBRemote,
                                                       HashDBServer)


def test_hashdb_remote_roundtrip():
    server = HashDBServer().start()
    try:
        remote = HashDBRemote("127.0.0.1", server.port)
        zero = (0, 0, 0, 0)
        key1 = (1, 2, 3, 4)
        key2 = (5, 6, 7, 8)
        r1 = remote.set("b1", zero, key1, 1000)
        assert r1.new_root != zero
        r2 = remote.set("b1", r1.new_root, key2, 2000)
        g = remote.get("b1", r2.new_root, key1)
        assert g.value == 1000
        g2 = remote.get("b1", r2.new_root, key2)
        assert g2.value == 2000
        # program storage
        remote.set_program("b1", key1, b"\x60\x0a\x60")
        assert remote.get_program("b1", key1) == b"\x60\x0a\x60"
        assert remote.get_program("b1", key2) is None
        # flush consolidates the batch
        remote.consolidate("b1")
        g3 = remote.get(None, r2.new_root, key1)
        assert g3.value == 1000
    finally:
        server.stop()


def test_hashdb_remote_discard():
    server = HashDBServer().start()
    try:
        remote = HashDBRemote("127.0.0.1", server.port)
        zero = (0, 0, 0, 0)
        r1 = remote.set("bx", zero, (9, 9, 9, 9), 123)
        remote.discard("bx")
        # after discard the batch overlay is gone; a fresh batch sees the
        # committed (empty) state
        r2 = remote.set("by", zero, (9, 9, 9, 9), 123)
        assert r2.new_root == r1.new_root
    finally:
        server.stop()
