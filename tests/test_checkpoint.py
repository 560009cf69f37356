"""Checkpoint / artifact persistence (reference saveProofToFile +
zkevmCmPolsAfterExecutor + runFileGen* stage re-runs,
config.hpp:56-63,123, main.cpp:594-701):

  * the committed trace saves to disk and proving resumes from it
    without re-execution, yielding a verifying proof;
  * the ProverService persists completed proof artifacts.
"""

import json
import os

import pytest

from tests.test_zkevm_proof import mini_rom
from xlayer_prover_tpu.prover_service import (BatchProver, ProverRequest,
                                              ProverService, RequestType)
from xlayer_prover_tpu.stark import prover, verifier


@pytest.fixture(scope="module")
def engine():
    from xlayer_prover_tpu.executor.input import BatchInput
    eng = BatchProver(mini_rom(), n_bits=13, chunk_bits=2, limb_bits=8,
                      n_queries=4, max_steps=1 << 12)
    inp = BatchInput()             # empty batch input: registers all zero
    res = eng.execute_only(inp, "ckpt")
    return eng, res


@pytest.mark.slow
def test_cmpols_roundtrip_resume(tmp_path, engine):
    eng, res = engine
    path = str(tmp_path / "zkevm.commit.npz")
    BatchProver.save_cm_pols(path, res)
    assert os.path.getsize(path) > 0
    cm1, publics = BatchProver.load_cm_pols(path)
    assert cm1.shape == res.cm1_np.shape
    assert publics == [int(p) % prover.P for p in res.publics]
    proof = eng.prove_from_trace(cm1, publics)
    assert verifier.verify(eng.air, eng.setup().verkey, proof)


def test_service_saves_proof_artifact(tmp_path):
    from xlayer_prover_tpu.models.toy import fib
    air = fib.build_air(n_bits=4, n_queries=2)
    const_np, cm1_np, publics = fib.gen_trace(air)
    setup = prover.Setup.build(air, const_np)
    svc = ProverService({"batch": (air, setup)},
                        artifacts_dir=str(tmp_path))
    try:
        req = ProverRequest(RequestType.GEN_BATCH_PROOF,
                            {"cm1": cm1_np, "publics": publics})
        svc.submit(req)
        svc.wait(req.uuid, timeout=120)
        assert req.proof is not None
        files = os.listdir(tmp_path)
        assert any(f.endswith(".gen_batch_proof.proof.json") for f in files)
        saved = json.loads(open(tmp_path / files[0]).read())
        assert "friFinalPol" in saved
    finally:
        svc.shutdown()


def test_cancel_running_proof():
    """Mid-proof cancellation: the worker aborts at a round boundary
    (the reference's cancel only affects queued jobs)."""
    import threading
    import time as _t

    from xlayer_prover_tpu.models.toy import fib
    air = fib.build_air(n_bits=7, n_queries=4)
    const_np, cm1_np, publics = fib.gen_trace(air)
    setup = prover.Setup.build(air, const_np)
    svc = ProverService({"batch": (air, setup)})
    try:
        req = ProverRequest(RequestType.GEN_BATCH_PROOF,
                            {"cm1": cm1_np, "publics": publics})
        svc.submit(req)
        # wait until it is actually running, then cancel
        for _ in range(500):
            if req.state.value == "running":
                break
            _t.sleep(0.01)
        assert svc.cancel(req.uuid)
        svc.wait(req.uuid, timeout=300)
        assert req.state.value in ("cancelled", "completed")
        # a fresh request still works afterwards
        req2 = ProverRequest(RequestType.GEN_BATCH_PROOF,
                             {"cm1": cm1_np, "publics": publics})
        svc.submit(req2)
        svc.wait(req2.uuid, timeout=300)
        assert req2.state.value == "completed"
    finally:
        svc.shutdown()


def test_constants_tree_artifact_roundtrip(tmp_path, engine):
    """Setup.save/load: the zkevmConstantsTree preload slot
    (config.hpp:132-136) — a loaded Setup proves and verifies
    identically to the freshly built one."""
    eng, res = engine
    path = str(tmp_path / "zkevm.consttree.npz")
    fresh = eng.setup()
    fresh.save(path)
    loaded = prover.Setup.load(path, eng.air)
    assert loaded.verkey == fresh.verkey
    # second engine, preload path: must skip the build entirely and hand
    # back the identical preprocessed data (the proof round trip over a
    # Setup is covered by test_cmpols_roundtrip_resume)
    eng2 = BatchProver(mini_rom(), n_bits=13, chunk_bits=2, limb_bits=8,
                       n_queries=4, max_steps=1 << 12)
    s2 = eng2.setup(constants_tree_file=path)
    assert s2.verkey == fresh.verkey
    import numpy as np
    assert np.array_equal(s2.const_n_np, fresh.const_n_np)
    assert np.array_equal(s2.const_ext_np, fresh.const_ext_np)
    assert len(s2.const_tree.levels) == len(fresh.const_tree.levels)
