#!/usr/bin/env bash
# Chain `train` into --steps segments resumed with --restore.
#
# Works around this rig's axon host-memory leak (BASELINE.md: every
# host->device staging buffer is retained by the tunnel's PJRT plugin, so a
# full-size run OOMs the host near 3k steps).  Each segment is a fresh
# process: the trainer checkpoints at every segment's final step, --restore
# resumes model/optimizer state exactly from it, and the resumed step is
# folded into the input pipeline's shuffle/augmentation streams so each
# segment consumes fresh batches (statistically equivalent to — not
# byte-identical with — an unbroken run).  On directly-attached TPU hosts a
# single `train` run is the normal path.
#
# usage: scripts/train_chain.sh TARGET_STEPS SEGMENT_STEPS [train args...]
# e.g.:  scripts/train_chain.sh 100000 2500 --config v2_93 --data data/ \
#            --model-dir models/v2_93 --compute-flow
set -euo pipefail

PYTHON=${PYTHON:-python3}
TARGET=$1
SEG=$2
shift 2

# Resumability: if the model dir already holds checkpoints (orbax layout:
# one numeric subdir per step), restart the chain FROM the latest one —
# a re-run after a crash must not retrain from scratch (it would also
# collide with the existing checkpoint at its segment end).
MODEL_DIR=""
prev=""
for a in "$@"; do
    if [ "$prev" = "--model-dir" ]; then MODEL_DIR=$a; fi
    prev=$a
done
STEP=0
RESTORE=()
if [ -n "$MODEL_DIR" ] && [ -d "$MODEL_DIR" ]; then
    LATEST=$(find "$MODEL_DIR" -maxdepth 1 -type d -name '[0-9]*' \
             -printf '%f\n' 2>/dev/null | sort -n | tail -1 || true)
    if [ -n "${LATEST:-}" ]; then
        STEP=$LATEST
        RESTORE=(--restore)
        echo "== train_chain: resuming from existing checkpoint step $STEP" >&2
    fi
fi
while [ "$STEP" -lt "$TARGET" ]; do
    NEXT=$(( STEP + SEG ))
    if [ "$NEXT" -gt "$TARGET" ]; then NEXT=$TARGET; fi
    echo "== train_chain: segment to step $NEXT / $TARGET" >&2
    # ${arr[@]+...} keeps `set -u` happy on bash < 4.4 when the array is empty.
    "$PYTHON" -m stabnet_tpu.cli.main train --steps "$NEXT" \
        ${RESTORE[@]+"${RESTORE[@]}"} "$@"
    RESTORE=(--restore)
    STEP=$NEXT
done
echo "== train_chain: reached step $TARGET" >&2
