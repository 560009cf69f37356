"""End-to-end aggregator protocol test over localhost gRPC.

The reference's canonical integration pattern (SURVEY A.7): a test
aggregator server and the prover client run in one process over localhost;
the script proves batches, aggregates them, and finalizes, checking ids and
cancel semantics.
"""

import json
import time

import numpy as np
import pytest

from xlayer_prover_tpu.models.toy import fib
from xlayer_prover_tpu.prover_service import ProverService
from xlayer_prover_tpu.services.aggregator import (AggregatorClient,
                                                   MockAggregatorServer)
from xlayer_prover_tpu.services.gen import aggregator_pb2 as pb
from xlayer_prover_tpu.stark import prover as stark_prover


@pytest.fixture(scope="module")
def stack():
    air = fib.build_air(n_bits=5, n_queries=4, with_lookup=False,
                        with_permutation=False)
    const_np, cm1_np, publics = fib.gen_trace(air)
    setup = stark_prover.Setup.build(air, const_np)
    prover = ProverService({"batch": (air, setup)})

    def decoder(_input_proto):
        return {"cm1": cm1_np, "publics": publics}

    server = MockAggregatorServer().start()
    client = AggregatorClient(prover, "127.0.0.1", server.port,
                              input_decoder=decoder,
                              watchdog_timeout_s=120.0)
    client.start()
    assert server.wait_connected(15.0)
    yield server, prover
    client.stop()
    server.stop()
    prover.shutdown()


def test_status(stack):
    server, _ = stack
    reply = server.ask("st-1", get_status_request=pb.GetStatusRequest())
    st = reply.get_status_response
    assert st.prover_name == "tpu-prover"
    assert st.fork_id == 9
    assert st.status in (pb.GetStatusResponse.STATUS_IDLE,
                         pb.GetStatusResponse.STATUS_COMPUTING)


def test_batch_proof_script(stack):
    server, _ = stack
    reply = server.ask("b-only", gen_batch_proof_request=
                       pb.GenBatchProofRequest())
    assert reply.gen_batch_proof_response.result == pb.RESULT_OK
    uid = reply.gen_batch_proof_response.id
    reply = server.ask("gp-only", get_proof_request=
                       pb.GetProofRequest(id=uid, timeout=300))
    assert reply.get_proof_response.result == \
        pb.GetProofResponse.RESULT_COMPLETED_OK


@pytest.mark.slow
def test_batch_aggregate_final_script(stack):
    """The reference A.7 script over the real recursion stack: batches ->
    recursive1 -> recursive2 aggregate -> final."""
    server, _ = stack
    # prove two batches
    ids = []
    for k in range(2):
        reply = server.ask(f"b-{k}", gen_batch_proof_request=
                           pb.GenBatchProofRequest())
        assert reply.gen_batch_proof_response.result == pb.RESULT_OK
        ids.append(reply.gen_batch_proof_response.id)

    proofs = []
    for k, uid in enumerate(ids):
        reply = server.ask(f"gp-{k}", timeout=600.0, get_proof_request=
                           pb.GetProofRequest(id=uid, timeout=600))
        assert reply.get_proof_response.result == \
            pb.GetProofResponse.RESULT_COMPLETED_OK, \
            reply.get_proof_response.result_string
        proofs.append(reply.get_proof_response.recursive_proof)

    # aggregate the two proofs
    reply = server.ask("agg-1", gen_aggregated_proof_request=
                       pb.GenAggregatedProofRequest(
                           recursive_proof_1=proofs[0],
                           recursive_proof_2=proofs[1]))
    assert reply.gen_aggregated_proof_response.result == pb.RESULT_OK
    agg_id = reply.gen_aggregated_proof_response.id
    reply = server.ask("gp-agg", timeout=2400.0, get_proof_request=
                       pb.GetProofRequest(id=agg_id, timeout=2400))
    assert reply.get_proof_response.result == \
        pb.GetProofResponse.RESULT_COMPLETED_OK
    agg_proof = reply.get_proof_response.recursive_proof
    agg_obj = json.loads(agg_proof)
    assert agg_obj.get("level") == 2

    # final proof
    reply = server.ask("fin-1", gen_final_proof_request=
                       pb.GenFinalProofRequest(recursive_proof=agg_proof,
                                               aggregator_addr="0xabc"))
    assert reply.gen_final_proof_response.result == pb.RESULT_OK
    fin_id = reply.gen_final_proof_response.id
    reply = server.ask("gp-fin", timeout=1200.0, get_proof_request=
                       pb.GetProofRequest(id=fin_id, timeout=1200))
    assert reply.get_proof_response.result == \
        pb.GetProofResponse.RESULT_COMPLETED_OK
    fin_obj = json.loads(reply.get_proof_response.recursive_proof)
    assert "final" in fin_obj and fin_obj["final"].get("level") == 2


def test_get_unknown_proof(stack):
    server, _ = stack
    reply = server.ask("gp-x", get_proof_request=
                       pb.GetProofRequest(id="nonexistent", timeout=1))
    assert reply.get_proof_response.result == pb.GetProofResponse.RESULT_ERROR


def test_config_loads_reference_style_json(tmp_path):
    import json as _json
    from xlayer_prover_tpu.utils.config import Config
    cfg = {"runExecutorServer": True, "dbMultiwrite": False,
           "maxSteps": 4096, "finalZkeyFile": "final.zkey",
           "hashDB64": True, "kvDBMaxVersions": 9,
           "aggregatorClientHost": "agg.example", "unknownKey": 1}
    p = tmp_path / "config.json"
    p.write_text(_json.dumps(cfg))
    c = Config.load(str(p))
    assert c.run_executor_server and not c.db_multiwrite
    assert c.max_steps == 4096 and c.final_zkey_file == "final.zkey"
    assert c.hashdb64 and c.kvdb_max_versions == 9
    assert c.aggregator_client_host == "agg.example"
    assert c.extra["unknownKey"] == 1
    c.check()
