#!/usr/bin/env bash
# Counterpart of reference bin/eval_mfp.sh.
#   bin/eval_flexdm.sh --job-dir tmp/jobs/crello/<ts> [--task_mode ...]
python -m flexdm_tpu.evaluation "$@"
