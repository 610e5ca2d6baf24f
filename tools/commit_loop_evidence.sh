#!/bin/bash
# Legacy entry point — evidence is now committed stage-by-stage during
# the run by tools/stage_evidence.sh (VERDICT r3 item 1). This just
# performs one final staging pass + commit.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/loop_r4} bash tools/stage_evidence.sh "${1:-final}"
