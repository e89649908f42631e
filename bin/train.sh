#!/usr/bin/env bash
# Train a model: bash bin/train.sh <dataset> <experiment> [key=value ...]
# Parity with the reference `bin/train.sh` CLI surface.
set -eu
DATASET=${1:?dataset (rico25|publaynet|synthetic)}
EXPERIMENT=${2:?experiment (layoutdm|maskgit|blt|bart|autoreg|ruite|vqdiffusion)}
shift 2
exec python -m layoutdm_tpu.train.loop "$EXPERIMENT" "$DATASET" "$@"
