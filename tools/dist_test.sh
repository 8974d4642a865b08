#!/usr/bin/env bash
# Multi-process eval launcher (see dist_train.sh). Each process evaluates
# its contiguous video shard (tools/test.py splits indices per rank, the
# reference's samplers/distributed_sampler.py semantics) and results are
# all-gathered on-device; rank 0 evaluates/writes.
set -euo pipefail
CONFIG=$1
shift
export JAX_COORDINATOR_ADDRESS=${COORD:-localhost:12355}
export JAX_NUM_PROCESSES=${NPROC:-1}

if [[ -n "${PROC_ID:-}" || "${JAX_NUM_PROCESSES}" == "1" ]]; then
  export JAX_PROCESS_ID=${PROC_ID:-0}
  exec python "$(dirname "$0")/test.py" "$CONFIG" "$@"
fi

pids=()
for ((r = 0; r < JAX_NUM_PROCESSES; r++)); do
  JAX_PROCESS_ID=$r python "$(dirname "$0")/test.py" "$CONFIG" "$@" &
  pids+=($!)
done
rc=0
for pid in "${pids[@]}"; do
  wait "$pid" || rc=$?
done
exit $rc
