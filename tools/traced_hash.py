"""Tree-hash of the traced-code surface behind the committed .dryrun_cache.

The driver's multichip dryrun relies on the committed compile cache
(.dryrun_cache) being fresh: any change to code that is traced by
__graft_entry__.dryrun_multichip silently invalidates the cache and
regresses the driver check to a timeout (VERDICT r4 weak #5).

tools/warm_dryrun_cache.sh writes the hash to .dryrun_cache/TREE_HASH;
tests/test_dryrun_cache.py fails when the working tree no longer
matches, which turns the tribal-knowledge rule into a mechanical one.

Usage: python tools/traced_hash.py   # prints the hash
"""

import hashlib
import os

# every package that contributes to the traced train/rollout graphs the
# dryrun compiles (pipeline/viewer/tools are host-only and excluded)
TRACED = [
    "__graft_entry__.py",
    "parc_tpu/anim",
    "parc_tpu/data",
    "parc_tpu/diffusion",
    "parc_tpu/envs",
    "parc_tpu/learning",
    "parc_tpu/parallel",
    "parc_tpu/physics",
    "parc_tpu/utils",
]


def traced_tree_hash(repo_root: str) -> str:
    h = hashlib.sha256()
    files = []
    for entry in TRACED:
        p = os.path.join(repo_root, entry)
        if os.path.isfile(p):
            files.append(entry)
            continue
        for dirpath, _, names in os.walk(p):
            for n in names:
                if n.endswith(".py"):
                    files.append(os.path.relpath(
                        os.path.join(dirpath, n), repo_root))
    for rel in sorted(files):
        h.update(rel.encode())
        h.update(b"\0")
        with open(os.path.join(repo_root, rel), "rb") as f:
            h.update(f.read())
        h.update(b"\0")
    return h.hexdigest()


if __name__ == "__main__":
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    print(traced_tree_hash(root))
