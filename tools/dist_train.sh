#!/usr/bin/env bash
# Multi-process training launcher — the jax.distributed analogue of the
# reference's torch.distributed.launch wrapper (tools/dist_train.sh).
# The env exported here is read by
# bevformer_tpu/runtime/distributed.py::maybe_initialize(), which calls
# jax.distributed.initialize() before any backend use.
#
# Two modes:
#   * external launcher (one invocation per host/process):
#       NPROC=<world> COORD=<host:port> PROC_ID=<rank> \
#         bash tools/dist_train.sh CONFIG --data-root DATA [args...]
#   * local fan-out (PROC_ID unset, NPROC>1): spawns NPROC processes on
#     this host, like `torch.distributed.launch --nproc_per_node`.
set -euo pipefail
CONFIG=$1
shift
export JAX_COORDINATOR_ADDRESS=${COORD:-localhost:12355}
export JAX_NUM_PROCESSES=${NPROC:-1}

if [[ -n "${PROC_ID:-}" || "${JAX_NUM_PROCESSES}" == "1" ]]; then
  export JAX_PROCESS_ID=${PROC_ID:-0}
  exec python "$(dirname "$0")/train.py" "$CONFIG" "$@"
fi

pids=()
for ((r = 0; r < JAX_NUM_PROCESSES; r++)); do
  JAX_PROCESS_ID=$r python "$(dirname "$0")/train.py" "$CONFIG" "$@" &
  pids+=($!)
done
rc=0
for pid in "${pids[@]}"; do
  wait "$pid" || rc=$?
done
exit $rc
