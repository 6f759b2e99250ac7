#!/bin/bash
# Round-6 reference-scale anchor queue (VERDICT r5 task #1).
# Sequential so each run gets the full machine; JSON lines appended to
# tools/refscale_r6.log as each finishes.
cd /root/repo
LOG=tools/refscale_r6.log
: > "$LOG"
run() {
  echo "=== START $* $(date -u +%H:%M:%S)" >> "$LOG"
  python tools/fm_reference_scale.py "$@" 2>/dev/null | tail -1 >> "$LOG"
  echo "=== END $* $(date -u +%H:%M:%S)" >> "$LOG"
}
run --task logreg --scale 1.0
run --task regressor --scale 1.0
run --task classifier --scale 1.0
run --task randforest --scale 0.5
run --task dectree --scale 0.5
echo "=== QUEUE DONE $(date -u +%H:%M:%S)" >> "$LOG"
