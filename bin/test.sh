#!/usr/bin/env bash
# Sample from a trained job: bash bin/test.sh <job_dir> <result_dir> [key=value ...]
set -eu
JOB_DIR=${1:?job_dir}
RESULT_DIR=${2:?result_dir}
shift 2
exec python -m layoutdm_tpu.sample_cli "job_dir=$JOB_DIR" "result_dir=$RESULT_DIR" "$@"
