"""Fork dispatch: per-fork ROM bundles through one table-driven
interpreter (reference executor.cpp:23-377 fork routing, SURVEY A.8).

Forks 6 (V1 input layout: globalExitRoot/timestamp), 7 and 8 execute
their reference e2e testvectors bit-exactly (state-root + accInputHash
parity); unknown fork ids are rejected at the service with
EXECUTOR_ERROR_UNSUPPORTED_FORK_ID.
"""

import json
import os

import pytest

from xlayer_prover_tpu.executor.forks import ForkRegistry
from xlayer_prover_tpu.executor.input import BatchInput
from xlayer_prover_tpu.executor.main_sm import Context, fea_to_scalar
from xlayer_prover_tpu.state.hashdb import HashDB

VEC = "/root/reference/testvectors/e2e/fork_{}/input_executor_0.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(VEC.format(7)), reason="reference testvectors absent")


@pytest.fixture(scope="module")
def registry():
    return ForkRegistry(max_steps=4_000_000)


@pytest.mark.parametrize("fork", [6, 7, 8])
def test_fork_state_root_parity(registry, fork):
    ex = registry.executor(fork)
    assert ex is not None
    inp = BatchInput.load(VEC.format(fork))
    h = HashDB()
    inp.load_db(h)
    ctx = Context(ex.rom, h, input_vars=inp.input_vars())
    inp.setup_registers(ctx)
    ex.execute(ctx)
    with open(VEC.format(fork)) as f:
        raw = json.load(f)
    assert ctx.done
    assert fea_to_scalar(ctx.regs.SR) == int(raw["newStateRoot"], 16)
    assert fea_to_scalar(ctx.regs.D) == int(raw["newAccInputHash"], 16)


def test_all_reference_forks_load(registry):
    # every frozen fork ROM loads through the table-driven interpreter
    for fork in range(1, 10):
        assert registry.supported(fork), fork
        assert registry.rom(fork) is not None
    assert not registry.supported(99)


def test_service_fork_rejection():
    from xlayer_prover_tpu.executor.executor import Executor
    from xlayer_prover_tpu.executor.rom import Rom
    from xlayer_prover_tpu.services.executor_service import \
        ExecutorServiceImpl
    from xlayer_prover_tpu.services.gen import executor_pb2 as pb
    rom = Rom.from_json({"program": [{"CONST": 0}],
                         "labels": {"start": 0, "finalizeExecution": 0},
                         "constants": {}})
    impl = ExecutorServiceImpl(Executor(rom, n_bits=11, max_steps=4),
                               HashDB())
    req = pb.ProcessBatchRequestV2(old_state_root=b"\x00" * 32, fork_id=99)
    resp = impl.process_batch_v2(req, None)
    assert resp.error == pb.EXECUTOR_ERROR_UNSUPPORTED_FORK_ID


def test_vendored_rom_bundles_match_reference():
    """The vendored gzipped ROM bundles load without the reference tree
    and parse identically to the reference files (checksum-pinned)."""
    import os
    from xlayer_prover_tpu import data as bundles
    from xlayer_prover_tpu.executor.rom import Rom
    from xlayer_prover_tpu.executor.storage_rom import StorageRom

    assert bundles.has_rom(9)
    rom = Rom.load_fork(9)
    assert len(rom.program) > 10000
    srom = StorageRom.load_default()
    assert len(srom) > 100
    ref = "/root/reference/src/main_sm/fork_9/scripts/rom.json"
    if os.path.exists(ref):
        ref_rom = Rom.load(ref)
        assert len(ref_rom.program) == len(rom.program)
        assert ref_rom.labels == rom.labels


def test_vendored_bundle_checksum_enforced(tmp_path, monkeypatch):
    """A corrupted vendored blob is rejected, not silently loaded."""
    import gzip
    import json as _json
    import shutil

    import pytest
    from xlayer_prover_tpu import data as bundles

    fake = tmp_path / "roms"
    fake.mkdir()
    shutil.copy(os.path.join(bundles._DATA_DIR, "MANIFEST.json"),
                fake / "MANIFEST.json")
    with gzip.open(fake / "storage_sm_rom.json.gz", "wb") as f:
        f.write(_json.dumps({"program": [], "labels": {}}).encode())
    monkeypatch.setattr(bundles, "_DATA_DIR", str(fake))
    with pytest.raises(RuntimeError, match="checksum"):
        bundles.load_storage_rom_json()
