#!/bin/bash
# Re-warm the committed compile cache for the driver's multichip dryrun.
#
# The driver runs __graft_entry__.dryrun_multichip(8) COLD on a 1-core
# host where full-train-step CPU compiles take many minutes (round-3
# MULTICHIP was rc=124). _force_cpu_if_virtual points the JAX persistent
# compile cache at <repo>/.dryrun_cache, so warming it here and
# committing the cache files makes the driver run compile ~nothing.
#
# RUN THIS AFTER ANY CHANGE TO TRACED CODE (engine/envs/ppo/mdm/mesh —
# the cache is keyed on the traced HLO) and commit the result:
#   bash tools/warm_dryrun_cache.sh && git add .dryrun_cache && git commit
set -euo pipefail
cd "$(dirname "$0")/.."
rm -rf .dryrun_cache
mkdir -p .dryrun_cache
unset JAX_COMPILATION_CACHE_DIR
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
python -u -c "
import time; t0 = time.time()
import __graft_entry__ as g
g.dryrun_multichip(8)
print(f'warm pass 1 (cold): {time.time()-t0:.1f}s')
"
du -sh .dryrun_cache
# verify the cache actually hits: second pass should be fast
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
python -u -c "
import time; t0 = time.time()
import __graft_entry__ as g
g.dryrun_multichip(8)
t = time.time()-t0
print(f'warm pass 2 (cached): {t:.1f}s')
assert t < 420, f'cache not effective: {t:.0f}s'
"
# record the traced-code tree hash so tests/test_dryrun_cache.py can
# fail loudly when the committed cache goes stale
python tools/traced_hash.py > .dryrun_cache/TREE_HASH
echo "OK — commit .dryrun_cache/"
