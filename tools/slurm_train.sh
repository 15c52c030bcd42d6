#!/usr/bin/env bash
# Slurm launcher for multi-host TPU training (analog of the reference
# tools/slurm_train.sh, which srun's one torch.distributed rank per GPU).
# JAX SPMD runs ONE process per host. tools/train.py calls
# `jax.distributed.initialize()` whenever Slurm launched >1 task
# (SLURM_NTASKS>1 — jax derives the coordinator from SLURM_STEP_NODELIST)
# or when JAX_COORDINATOR_ADDRESS is exported to every task; no manual env
# setup is needed under this launcher.
#
# Usage: [NODES=n] [SRUN_ARGS=...] tools/slurm_train.sh PARTITION JOB CONFIG WORK_DIR [py args...]
set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
WORK_DIR=$4
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
    python -u "$(dirname $0)/train.py" ${CONFIG} --work-dir=${WORK_DIR} ${PY_ARGS}
