#!/bin/bash
# Generate Python protobuf messages from the reference wire protocol
# definitions (aggregator/executor/hashdb .proto).  The .proto files define
# the EXTERNAL wire contract the framework must speak unchanged (SURVEY §5:
# hard external-compat requirement); they are consumed from the reference
# checkout (or any zkevm-prover checkout) at build time rather than vendored.
set -e
PROTO_DIR=${1:-/root/reference/src/grpc/proto}
OUT=$(dirname "$0")/../xlayer_prover_tpu/services/gen
mkdir -p "$OUT"
for p in aggregator executor hashdb; do
    protoc --proto_path="$PROTO_DIR" --python_out="$OUT" "$PROTO_DIR/$p.proto"
done
touch "$OUT/__init__.py"
echo "generated: $(ls "$OUT")"
