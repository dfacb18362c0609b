#!/usr/bin/env bash
# Re-measure the hardware anchors after changes landed during a relay
# outage (see CLAUDE.md "UNMEASURED ON HARDWARE").  Run on the TPU host
# with the axon relay healthy (probe first: tools/probe below).
#
#   bash tools/remeasure_hw.sh [outdir]
#
# Writes profile/bench JSON lines under $outdir (default /tmp/hw_remeasure)
# and prints a summary.  Update PARITY.md "Performance" + CLAUDE.md notes
# from these, then delete the UNMEASURED block.
set -e
set -o pipefail  # a crashing profile must not be masked by its tee
OUT=${1:-/tmp/hw_remeasure}
mkdir -p "$OUT"

echo "== backend probe =="
timeout 180 python -c "import jax, jax.numpy as jnp; print('probe ok:', float(jax.jit(lambda a:(a@a).sum())(jnp.ones((256,256)))))"

echo "== full step profile (f32) =="
python tools/profile_step.py --fine | tee "$OUT/profile_f32.json"
echo "== full step profile (bf16) =="
python tools/profile_step.py --fine --dtype bfloat16 | tee "$OUT/profile_bf16.json"
echo "== bench (full) =="
python bench.py | tee "$OUT/bench.json"

echo "done; artifacts in $OUT"
