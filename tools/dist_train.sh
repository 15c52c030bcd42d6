#!/usr/bin/env bash
# Multi-host training launcher (the TPU replacement for the reference's
# tools/dist_train.sh torch.distributed.launch wrapper): JAX SPMD wants ONE
# identical process per host. On TPU pods the runtime wires coordination
# automatically; elsewhere set:
#   JAX_COORDINATOR_ADDRESS=<host0>:<port> JAX_NUM_PROCESSES=<n> \
#   JAX_PROCESS_ID=<i> tools/dist_train.sh CONFIG [args...]
# tools/train.py calls jax.distributed.initialize() when the coordinator
# address is present.
set -e
CONFIG=$1
shift
exec python "$(dirname "$0")/train.py" "$CONFIG" "$@"
