"""GenStatelessBatchProof over the aggregator stream.

The production stateless path (reference aggregator_client.cpp:377-448):
the aggregator ships an Erigon witness blob + sequencer datastream over the
bidi stream; the prover rebuilds the pre-state (witness2db), re-encodes
batchL2Data (dataStream2batch) and runs a standard batch proof.  The reply
rides gen_batch_proof_response, exactly like the reference.
"""

import json
import os
import threading

import pytest

from xlayer_prover_tpu.services.aggregator import (AggregatorClient,
                                                   MockAggregatorServer)
from xlayer_prover_tpu.services.gen import aggregator_pb2 as pb

VEC = "/root/reference/testvectors/stateless/input_executor_0.json"


class CaptureProver:
    """ProverService facade capturing submitted requests."""

    def __init__(self):
        self.requests = []
        self.event = threading.Event()

    def submit(self, req):
        self.requests.append(req)
        self.event.set()
        return f"cap-{len(self.requests)}"

    def queue_depth(self):
        return 0

    def get(self, uid):
        return None

    def cancel(self, uid):
        return False


@pytest.fixture()
def stream():
    prover = CaptureProver()
    server = MockAggregatorServer().start()
    client = AggregatorClient(prover, "127.0.0.1", server.port)
    client.start()
    assert server.wait_connected(15.0)
    yield server, prover
    client.stop()
    server.stop()


@pytest.mark.skipif(not os.path.exists(VEC), reason="testvector absent")
def test_stateless_request_decodes_and_submits(stream):
    server, prover = stream
    d = json.load(open(VEC))
    req = pb.GenStatelessBatchProofRequest()
    pi = req.input.public_inputs
    pi.witness = bytes.fromhex(d["witness"].removeprefix("0x"))
    pi.data_stream = bytes.fromhex(d["dataStream"].removeprefix("0x"))
    pi.sequencer_addr = d["sequencerAddr"]
    pi.timestamp_limit = int(d["timestampLimit"])

    reply = server.ask("sl-1", gen_stateless_batch_proof_request=req)
    resp = reply.gen_batch_proof_response
    assert resp.result == pb.RESULT_OK
    assert resp.id.startswith("cap-")
    assert prover.event.wait(5.0)

    preq = prover.requests[0]
    inp = preq.payload["input"]
    # pre-state rebuilt from the witness (root + node map + bytecode)
    from xlayer_prover_tpu.state.witness import witness2db
    wres = witness2db(pi.witness)
    assert inp.old_state_root == wres.state_root
    assert inp.db_raw and inp.db_raw == wres.db
    assert inp.programs_raw == wres.programs
    # batch decoded from the datastream
    from xlayer_prover_tpu.state.datastream import (batch_to_l2_data,
                                                    datastream2batch)
    batch = datastream2batch(pi.data_stream)
    assert inp.chain_id == batch.chain_id
    assert inp.fork_id == batch.fork_id
    assert inp.batch_l2_data == batch_to_l2_data(batch)
    assert inp.sequencer_addr == int(d["sequencerAddr"], 16)


def test_stateless_empty_witness_is_error(stream):
    server, prover = stream
    req = pb.GenStatelessBatchProofRequest()
    req.input.public_inputs.data_stream = b"\x01"
    reply = server.ask("sl-e1", gen_stateless_batch_proof_request=req)
    assert reply.gen_batch_proof_response.result == pb.RESULT_ERROR
    assert not prover.requests


@pytest.mark.skipif(not os.path.exists(VEC), reason="testvector absent")
def test_stateless_empty_datastream_is_error(stream):
    server, prover = stream
    d = json.load(open(VEC))
    req = pb.GenStatelessBatchProofRequest()
    req.input.public_inputs.witness = \
        bytes.fromhex(d["witness"].removeprefix("0x"))
    reply = server.ask("sl-e2", gen_stateless_batch_proof_request=req)
    assert reply.gen_batch_proof_response.result == pb.RESULT_ERROR
    assert not prover.requests
