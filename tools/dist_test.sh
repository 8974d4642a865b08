#!/usr/bin/env bash
# Multi-host eval launcher (see dist_train.sh). Each process evaluates its
# contiguous video shard (data/sampler.py::ContiguousVideoSampler).
set -euo pipefail
CONFIG=$1
shift
export JAX_COORDINATOR_ADDRESS=${COORD:-localhost:12355}
export JAX_NUM_PROCESSES=${NPROC:-1}
export JAX_PROCESS_ID=${PROC_ID:-0}
exec python "$(dirname "$0")/test.py" "$CONFIG" "$@"
