#!/usr/bin/env bash
# Multi-host training launcher — the jax.distributed analogue of the
# reference's torch.distributed.launch wrapper (tools/dist_train.sh).
# Single-host multi-chip needs no launcher (jax sees all local chips);
# for multi-host pods set the coordinator env per process:
#   NPROC=<num processes> COORD=<host:port> PROC_ID=<this process index> \
#     bash tools/dist_train.sh CONFIG --data-root DATA [args...]
set -euo pipefail
CONFIG=$1
shift
export JAX_COORDINATOR_ADDRESS=${COORD:-localhost:12355}
export JAX_NUM_PROCESSES=${NPROC:-1}
export JAX_PROCESS_ID=${PROC_ID:-0}
exec python "$(dirname "$0")/train.py" "$CONFIG" "$@"
