#!/usr/bin/env bash
# Chain `train` into --steps segments resumed with --restore.
#
# Works around this rig's axon host-memory leak (BASELINE.md: every
# host->device staging buffer is retained by the tunnel's PJRT plugin, so a
# full-size run OOMs the host near 3k steps).  Each segment is a fresh
# process; Orbax checkpoints make the chain exact (the trainer saves at each
# segment's final step and --restore resumes from it).  On directly-attached
# TPU hosts a single `train` run is the normal path.
#
# usage: scripts/train_chain.sh TARGET_STEPS SEGMENT_STEPS [train args...]
# e.g.:  scripts/train_chain.sh 100000 2500 --config v2_93 --data data/ \
#            --model-dir models/v2_93 --compute-flow
set -euo pipefail

TARGET=$1
SEG=$2
shift 2

STEP=0
RESTORE=()
while [ "$STEP" -lt "$TARGET" ]; do
    NEXT=$(( STEP + SEG ))
    if [ "$NEXT" -gt "$TARGET" ]; then NEXT=$TARGET; fi
    echo "== train_chain: segment to step $NEXT / $TARGET" >&2
    python -m stabnet_tpu.cli.main train --steps "$NEXT" "${RESTORE[@]}" "$@"
    RESTORE=(--restore)
    STEP=$NEXT
done
echo "== train_chain: reached step $TARGET" >&2
