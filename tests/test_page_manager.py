"""PageManager: COW editing, flush/discard, growth, file persistence."""

import os

from xlayer_prover_tpu.state.page_manager import PAGE_SIZE, PageManager


def test_cow_edit_flush():
    pm = PageManager()
    p = pm.get_free_page()
    pm.write_page(p, b"original")
    shadow = pm.edit_page(p)
    assert shadow != p
    pm.write_page(shadow, b"edited")
    # original untouched until flush
    assert pm.read_page(p)[:8] == b"original"
    assert pm.edit_page(p) == shadow      # same shadow within the generation
    pm.flush()
    assert pm.read_page(shadow)[:6] == b"edited"
    # the original page was recycled into the free list
    assert p in pm.free_list


def test_discard():
    pm = PageManager()
    p = pm.get_free_page()
    pm.write_page(p, b"keep")
    s = pm.edit_page(p)
    pm.write_page(s, b"scrap")
    free_before = pm.n_free
    pm.discard()
    assert pm.read_page(p)[:4] == b"keep"
    assert pm.n_free == free_before + 1


def test_growth():
    pm = PageManager(initial_pages=4)
    pages = [pm.get_free_page() for _ in range(10)]
    assert len(set(pages)) == 10
    assert pm.n_pages >= 10


def test_file_persistence(tmp_path):
    path = str(tmp_path / "state.pages")
    pm = PageManager(path, initial_pages=8)
    p = pm.get_free_page()
    pm.write_page(p, b"durable-bytes")
    pm.flush()
    pm2 = PageManager(path, initial_pages=8)
    assert pm2.read_page(p)[:13] == b"durable-bytes"
    assert len(pm2.read_page(p)) == PAGE_SIZE


def test_reopen_does_not_reallocate_live_pages(tmp_path):
    """Reopen-write-reopen roundtrip: pages allocated in a previous open
    must never be handed out again (the allocation watermark persists)."""
    path = str(tmp_path / "state.pages")
    pm = PageManager(path, initial_pages=8)
    live = [pm.get_free_page() for _ in range(3)]
    for i, p in enumerate(live):
        pm.write_page(p, b"gen0-%d" % i)
    pm.flush()

    pm2 = PageManager(path, initial_pages=8)
    fresh = pm2.get_free_page()
    assert fresh not in live
    pm2.write_page(fresh, b"gen1")
    pm2.flush()

    pm3 = PageManager(path, initial_pages=8)
    for i, p in enumerate(live):
        assert pm3.read_page(p)[:6] == b"gen0-%d" % i
    assert pm3.read_page(fresh)[:4] == b"gen1"
    assert pm3.get_free_page() not in live + [fresh]


def test_reopen_legacy_file_without_sidecar_is_conservative(tmp_path):
    """A legacy pool file without a .wm sidecar treats every existing page
    as used."""
    path = str(tmp_path / "state.pages")
    pm = PageManager(path, initial_pages=8)
    p = pm.get_free_page()
    pm.write_page(p, b"legacy")
    pm.flush()
    os.remove(path + ".wm")
    pm2 = PageManager(path, initial_pages=8)
    assert pm2.get_free_page() >= 8
    assert pm2.read_page(p)[:6] == b"legacy"
