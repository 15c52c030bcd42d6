#!/usr/bin/env bash
# Multi-host eval launcher (reference tools/dist_test.sh analog); see
# dist_train.sh for the environment contract.
set -e
CONFIG=$1
CKPT=$2
shift 2
exec python "$(dirname "$0")/test.py" "$CONFIG" "$CKPT" "$@"
