#!/usr/bin/env bash
# Slurm launcher for multi-host TPU evaluation (analog of the reference
# tools/slurm_test.sh). One process per host — see slurm_train.sh.
# tools/test.py initializes jax.distributed when SLURM_NTASKS>1, shards the
# dataset by jax.process_index(), all-gathers results over ICI (the
# collect_results_gpu analog), and writes --out from rank 0 only.
#
# Usage: [NODES=n] [SRUN_ARGS=...] tools/slurm_test.sh PARTITION JOB CONFIG CHECKPOINT [py args...]
set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
NODES=${NODES:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-16}
PY_ARGS=${@:5}
SRUN_ARGS=${SRUN_ARGS:-""}

PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
srun -p ${PARTITION} \
    --job-name=${JOB_NAME} \
    --nodes=${NODES} \
    --ntasks=${NODES} \
    --ntasks-per-node=1 \
    --cpus-per-task=${CPUS_PER_TASK} \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u "$(dirname $0)/test.py" ${CONFIG} ${CHECKPOINT} ${PY_ARGS}
