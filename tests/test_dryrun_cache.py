"""Freshness guard for the committed multichip dryrun compile cache.

The driver runs __graft_entry__.dryrun_multichip(8) cold; the committed
.dryrun_cache makes that fast.  The cache is keyed on traced HLO, so any
edit to traced code silently invalidates it (MULTICHIP rc=124 in round
3).  This test makes the staleness loud: when it fails, run

    bash tools/warm_dryrun_cache.sh && git add .dryrun_cache
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from traced_hash import traced_tree_hash  # noqa: E402


def test_dryrun_cache_matches_traced_code():
    marker = os.path.join(REPO, ".dryrun_cache", "TREE_HASH")
    assert os.path.exists(marker), (
        ".dryrun_cache/TREE_HASH missing — run "
        "`bash tools/warm_dryrun_cache.sh` and commit .dryrun_cache/")
    with open(marker) as f:
        committed = f.read().strip()
    current = traced_tree_hash(REPO)
    assert committed == current, (
        "traced code changed since .dryrun_cache was warmed — the "
        "driver's multichip dryrun would recompile cold (rc=124 risk). "
        "Run `bash tools/warm_dryrun_cache.sh && git add .dryrun_cache`.")
