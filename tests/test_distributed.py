"""Real multi-process initialization: two OS processes rendezvous through
``parallel.mesh.init_distributed`` (jax.distributed coordinator) and run a
cross-process allgather — the TPU-pod/DCN path the reference covers with
its torch.distributed TCP rendezvous (util/mp_util.py:10-41)."""

import os
import subprocess
import sys
import textwrap

CHILD = textwrap.dedent("""
    import sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    from parc_tpu.parallel import mesh as mesh_lib

    pid, port = int(sys.argv[1]), sys.argv[2]
    mesh_lib.init_distributed(f"localhost:{port}", 2, pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid, (jax.process_index(), pid)
    assert mesh_lib.is_primary() == (pid == 0)

    from jax.experimental import multihost_utils
    got = multihost_utils.process_allgather(
        np.asarray([jax.process_index() + 1.0]))
    assert got.ravel().tolist() == [1.0, 2.0], got
    print("DIST_OK", pid)
""")


def test_init_distributed_two_processes(tmp_path, free_tcp_port):
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    repo_root = os.path.dirname(os.path.dirname(__file__))
    # PYTHONPATH deliberately EXCLUDES any ambient entries (e.g. the
    # remote-TPU sitecustomize dir): the children must own JAX init so
    # jax.distributed can rendezvous before any backend comes up.
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               JAX_PLATFORMS="cpu",
               PYTHONPATH=repo_root)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(free_tcp_port)],
            env=env, cwd=repo_root,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{o}"
        assert f"DIST_OK {i}" in o, f"proc {i} output:\n{o}"
