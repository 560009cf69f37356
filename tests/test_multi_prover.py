"""Multi-prover scale-out: N stateless provers <-> one aggregator
(reference P6, SURVEY §2.7 + the A.7 canonical script at fleet shape:
4 batch proofs -> 2 aggregations -> 1 aggregation -> final, distributed
across two prover processes over the real gRPC stream protocol).

Provers are stateless: proofs travel as JSON and any prover can verify /
aggregate any other prover's output (identical circuit setups), so a
crashed prover's jobs re-dispatch — the reference's elastic-capacity
model (aggregator_client.cpp:851-872).
"""

import json

import pytest

from xlayer_prover_tpu.models.toy import fib
from xlayer_prover_tpu.prover_service import ProverService
from xlayer_prover_tpu.services.aggregator import (AggregatorClient,
                                                   MockAggregatorServer)
from xlayer_prover_tpu.services.gen import aggregator_pb2 as pb
from xlayer_prover_tpu.stark import prover as stark_prover

N_PROVERS = 2


@pytest.fixture(scope="module")
def fleet():
    air = fib.build_air(n_bits=5, n_queries=4, with_lookup=False,
                        with_permutation=False)
    const_np, cm1_np, publics = fib.gen_trace(air)
    setup = stark_prover.Setup.build(air, const_np)

    def decoder(_input_proto):
        return {"cm1": cm1_np, "publics": publics}

    server = MockAggregatorServer().start()
    provers, clients = [], []
    for k in range(N_PROVERS):
        svc = ProverService({"batch": (air, setup)})
        client = AggregatorClient(svc, "127.0.0.1", server.port,
                                  input_decoder=decoder,
                                  prover_name=f"tpu-prover-{k}")
        client.start()
        provers.append(svc)
        clients.append(client)
    assert server.wait_connected(20.0, n=N_PROVERS)
    yield server, provers
    for c in clients:
        c.stop()
    server.stop()
    for svc in provers:
        svc.shutdown()


def _get_proof(server, tag, gen_msg_id, uid, timeout=2400):
    owner = server.reply_client.get(gen_msg_id)
    reply = server.ask(tag, timeout=float(timeout), client=owner,
                       get_proof_request=
                       pb.GetProofRequest(id=uid, timeout=timeout))
    assert reply.get_proof_response.result == \
        pb.GetProofResponse.RESULT_COMPLETED_OK, \
        reply.get_proof_response.result_string
    return reply.get_proof_response.recursive_proof


@pytest.mark.slow
def test_four_batch_aggregation_tree(fleet):
    server, provers = fleet

    batch_ids = []
    for k in range(4):
        reply = server.ask(f"mb-{k}", gen_batch_proof_request=
                           pb.GenBatchProofRequest())
        assert reply.gen_batch_proof_response.result == pb.RESULT_OK
        batch_ids.append(reply.gen_batch_proof_response.id)
    proofs = [_get_proof(server, f"mgp-{k}", f"mb-{k}", uid)
              for k, uid in enumerate(batch_ids)]

    level1 = []
    for k in range(2):
        reply = server.ask(f"magg-{k}", gen_aggregated_proof_request=
                           pb.GenAggregatedProofRequest(
                               recursive_proof_1=proofs[2 * k],
                               recursive_proof_2=proofs[2 * k + 1]))
        assert reply.gen_aggregated_proof_response.result == pb.RESULT_OK
        level1.append(reply.gen_aggregated_proof_response.id)
    aggs = [_get_proof(server, f"mgpa-{k}", f"magg-{k}", uid)
            for k, uid in enumerate(level1)]
    for a in aggs:
        assert json.loads(a).get("level") == 2

    reply = server.ask("magg-top", gen_aggregated_proof_request=
                       pb.GenAggregatedProofRequest(
                           recursive_proof_1=aggs[0],
                           recursive_proof_2=aggs[1]))
    assert reply.gen_aggregated_proof_response.result == pb.RESULT_OK
    top = _get_proof(server, "mgpa-top", "magg-top",
                     reply.gen_aggregated_proof_response.id)
    assert json.loads(top).get("level") == 3

    reply = server.ask("mfin", gen_final_proof_request=
                       pb.GenFinalProofRequest(recursive_proof=top,
                                               aggregator_addr="0xabc"))
    assert reply.gen_final_proof_response.result == pb.RESULT_OK
    _get_proof(server, "mgpf", "mfin", reply.gen_final_proof_response.id)

    # the fleet worked all jobs through the shared queue; distribution
    # between provers is elastic (whoever polls first wins a job), so
    # only the total is asserted
    handled = [len(svc.requests) for svc in provers]
    assert sum(handled) >= 8, handled
