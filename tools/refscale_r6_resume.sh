#!/bin/bash
# Resume of refscale_r6.sh after session restart killed it mid-regressor.
cd /root/repo
LOG=tools/refscale_r6.log
echo "=== RESUME $(date -u +%H:%M:%S)" >> "$LOG"
run() {
  echo "=== START $* $(date -u +%H:%M:%S)" >> "$LOG"
  python tools/fm_reference_scale.py "$@" 2>/dev/null | tail -1 >> "$LOG"
  echo "=== END $* $(date -u +%H:%M:%S)" >> "$LOG"
}
run --task regressor --scale 1.0
run --task classifier --scale 1.0
run --task randforest --scale 0.5
run --task dectree --scale 0.5
echo "=== QUEUE DONE $(date -u +%H:%M:%S)" >> "$LOG"
