#!/usr/bin/env bash
# Counterpart of reference bin/train_mfp.sh: timestamped job dir per run.
#   bin/train_flexdm.sh [dataset] [extra --flags...]
set -e

# Flags-only invocation: keep the default dataset and forward everything.
if [[ "${1:-}" == -* ]]; then
    DATASET="crello"
    EXTRA=("$@")
else
    DATASET=${1:-"crello"}
    EXTRA=("${@:2}")
fi
NOW=$(date '+%Y%m%d%H%M%S')

DATA_DIR=${DATA_DIR:-"data/${DATASET}"}
JOB_DIR=${JOB_DIR:-"tmp/jobs/${DATASET}/${NOW}"}

echo "DATA_DIR=${DATA_DIR}"
echo "JOB_DIR=${JOB_DIR}"

python -m flexdm_tpu \
    --dataset_name "${DATASET}" \
    --data_dir "${DATA_DIR}" \
    --job-dir "${JOB_DIR}" \
    "${EXTRA[@]}"
