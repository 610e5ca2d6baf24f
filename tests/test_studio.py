"""Interactive studio (MOTION_FORGE equivalent): server-side ops + HTTP.

The Studio class is the whole framework surface behind the browser UI —
terrain procgen/editing, A*, optimization, motion editing, contact
editing, physics tracking — exercised here without a browser.
"""

import json
import threading

import numpy as np
import pytest

from parc_tpu.data.humanoid import humanoid_spec
from parc_tpu.data.synthetic import standing_clip, walking_clip
from parc_tpu.viewer.studio import Studio, StudioError, make_server


@pytest.fixture(scope="module")
def model():
    return humanoid_spec().build()


@pytest.fixture()
def studio(model):
    return Studio(model, walking_clip(seed=0))


def test_state_payload(studio):
    s = studio.state()
    assert s["clips"] and s["clips"][0]["label"] == "motion"
    assert s["terrain"] is not None
    assert len(s["parents"]) == studio.model.num_bodies
    nb = studio.model.num_bodies
    assert np.asarray(s["clips"][0]["body_pos"]).shape[1:] == (nb, 3)


def test_procgen_and_edit(studio):
    for kind in ("flat", "boxes", "stairs", "paths", "perlin", "parkour",
                 "cave"):
        s = studio.procgen(kind=kind, x_dim=16, y_dim=16)
        assert np.isfinite(np.asarray(s["terrain"]["hf"])).all(), kind
    s = studio.procgen(kind="flat", x_dim=8, y_dim=8)
    s = studio.edit_cells(cells=[[2, 3], [4, 4]], dh=0.5)
    hf = np.asarray(s["terrain"]["hf"])
    assert hf[2, 3] == pytest.approx(0.5) and hf[4, 4] == pytest.approx(0.5)
    s = studio.edit_cells(cells=[[2, 3]], set_h=1.25)
    assert np.asarray(s["terrain"]["hf"])[2, 3] == pytest.approx(1.25)
    with pytest.raises(StudioError):
        studio.handle("procgen", {"kind": "nope"})


def test_astar_on_edited_terrain(studio):
    studio.procgen(kind="flat", x_dim=12, y_dim=12)
    # wall with a gap
    studio.edit_cells(cells=[[6, j] for j in range(11)], set_h=3.0)
    s = studio.astar(start=[1, 1], end=[10, 10])
    assert s["path"] is not None
    path = np.asarray(s["path"])
    assert path.shape[-1] == 3
    # path must route through the gap column (j == 11)
    assert "nodes" in s["status"]


def test_edit_ops_and_contacts(studio):
    n0 = studio.motion.frames.shape[0]
    s = studio.flip()
    assert "mirrored" in s["status"]
    s = studio.slice(start=5, end=25)
    assert studio.motion.frames.shape[0] == 20
    s = studio.resample(fps=15.0)
    assert studio.motion.fps == 15.0
    s = studio.recompute_contacts()
    assert studio.motion.contacts.shape == (
        studio.motion.frames.shape[0], studio.model.num_bodies)
    s = studio.set_contact(frame=0, body=3, value=1.0)
    assert studio.motion.contacts[0, 3] == 1.0
    del n0, s


def test_optimize_and_accept(studio):
    studio.recompute_contacts()
    s = studio.optimize(iters=5)
    assert studio.overlay is not None
    assert "optimized" in s["status"]
    assert len(s["clips"]) == 2
    s = studio.accept_overlay()
    assert studio.overlay is None and len(s["clips"]) == 1


def test_track_untrained(model):
    # standing clip: even an untrained (near-zero-mean) policy usually holds
    # long enough to produce a recorded overlay; accept the explicit failure
    # status as valid machinery output too.
    st = Studio(model, standing_clip())
    s = st.track(num_steps=8)
    assert ("tracked" in s["status"]) or ("failed" in s["status"])


def test_save_load_roundtrip(studio, tmp_path):
    studio.workspace = str(tmp_path)  # load/save are workspace-confined
    p = str(tmp_path / "clip.npz")
    studio.save(path=p)
    with pytest.raises(StudioError):     # escape attempts are refused
        studio.save(path="/etc/clip.npz")
    s = studio.load(path=p)
    assert "loaded" in s["status"]
    with pytest.raises(StudioError):
        studio.handle("save", {"bogus_arg": 1})


def test_http_server(model):
    st = Studio(model, walking_clip(seed=1))
    server = make_server(st, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        import http.client
        host, port = server.server_address
        conn = http.client.HTTPConnection(host, port, timeout=30)
        conn.request("GET", "/")
        page = conn.getresponse().read().decode()
        assert "parc_tpu studio" in page
        conn.request("GET", "/api/state")
        state = json.loads(conn.getresponse().read())
        assert state["clips"]
        body = json.dumps({"kind": "boxes", "x_dim": 8, "y_dim": 8})
        conn.request("POST", "/api/procgen", body=body,
                     headers={"Content-Type": "application/json"})
        out = json.loads(conn.getresponse().read())
        assert np.asarray(out["terrain"]["hf"]).shape == (8, 8)
        # error path -> 400 with json error
        conn.request("POST", "/api/astar",
                     body=json.dumps({"start": [0, 0]}),
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400
        assert "error" in json.loads(r.read())
        conn.close()
    finally:
        server.shutdown()
        server.server_close()


def test_mdm_gen_in_studio(model, tmp_path):
    """Studio diffusion workflow: A* plan -> MDM generation from a saved
    checkpoint (diffusion_gui / mdm_tester parity). Tiny untrained MDM —
    structural correctness only."""
    import jax
    from parc_tpu.anim import motion_lib as ml
    from parc_tpu.diffusion.mdm import MDM, MDMConfig
    from parc_tpu.utils import checkpoint as ckpt_lib

    tiny = dict(diffusion_timesteps=11, d_model=32, num_heads=2,
                d_hid=32, num_layers=1)
    st = Studio(model, walking_clip(seed=0), mdm_config=tiny,
                mdm_dir=str(tmp_path / "mdm"))
    # save a tiny init checkpoint for the studio to restore
    mdm = MDM(model, MDMConfig(**tiny))
    lib = ml.build_motion_lib(model, [st.motion])
    state = mdm.init(lib, jax.random.PRNGKey(0), stats_samples=64)
    ckpt_lib.save(str(tmp_path / "mdm" / "checkpoints"), 1, state)

    st.procgen(kind="flat", x_dim=12, y_dim=12)
    st.astar(start=[2, 2], end=[9, 9])
    with pytest.raises(StudioError):
        Studio(model, walking_clip(seed=0)).mdm_gen()  # no mdm_dir
    s = st.mdm_gen(batch_size=2, max_seconds=1.0)
    assert "mdm_gen" in s["status"]
    assert st.motion.frames.shape[-1] == 34
    assert np.all(np.isfinite(st.motion.frames))


def test_stitch_op(studio, tmp_path):
    """Motion-matching stitch (reference MOTION_FORGE/polyscope_stitcher):
    stitching a saved copy of the current clip reproduces its length and
    stays continuous at the seam."""
    studio.workspace = str(tmp_path)
    n = studio.motion.frames.shape[0]
    studio.save(path="b.npz")
    s = studio.handle("stitch", {"path": "b.npz",
                                 "range_a": [n // 2, n // 2 + 1]})
    assert "stitched" in s["status"]
    f = studio.motion.frames
    assert f.shape[0] == n
    # seam continuity: the per-frame root displacement around the seam is
    # bounded by the clip's own max step
    step = np.linalg.norm(np.diff(f[:, 0:3], axis=0), axis=-1)
    assert step.max() < 0.2
    if studio.motion.contacts is not None:
        assert studio.motion.contacts.shape[0] == n


def test_snap_discrete(studio):
    """snap_discrete drops untouched cells to the lowest level and snaps
    path cells to a discrete level (terrain_gui.py:182 parity op)."""
    studio.procgen(kind="flat", x_dim=20, y_dim=20)
    levels = (-2.0, -1.0, 0.0, 1.0)
    s = studio.handle("snap_discrete", {"heights": levels})
    hf = np.asarray(s["terrain"]["hf"])
    assert set(np.unique(hf)).issubset(set(levels))
    # the walking clip moves along the terrain: some cells stay walkable
    assert (hf > -2.0).any() and (hf == -2.0).any()


def test_terrain_filter_ops(studio):
    """MOTION_FORGE terrain GUI filters (terrain_gui.py:157,308,319)."""
    studio.procgen(kind="boxes", x_dim=16, y_dim=16)
    for kind in ("remove_sharp_lines", "flat_maxpool_2x2",
                 "flat_maxpool_3x3"):
        s = studio.handle("terrain_filter", {"kind": kind})
        assert np.isfinite(np.asarray(s["terrain"]["hf"])).all(), kind
        assert np.asarray(s["terrain"]["hf"]).shape == (16, 16), kind
    s = studio.handle("terrain_filter", {"kind": "downsample"})
    hf = np.asarray(s["terrain"]["hf"])
    assert hf.shape == (8, 8)
    assert np.isfinite(hf).all()
    with pytest.raises(StudioError):
        studio.handle("terrain_filter", {"kind": "nope"})


def test_live_sim_session(model):
    # MOTION_FORGE IG-in-the-loop parity: sim_start opens a persistent
    # physics session, each sim_step grows the live overlay, sim_stop
    # ends the session but keeps the overlay for accept/compare.
    st = Studio(model, standing_clip())
    with pytest.raises(StudioError):
        st.sim_step()                       # no session yet
    s = st.handle("sim_start", {})
    assert "live sim started" in s["status"]
    s = st.handle("sim_step", {"steps": 8})
    assert st.overlay is not None and st.overlay_label == "live sim"
    n1 = st.overlay.frames.shape[0]
    assert n1 >= 8
    s = st.handle("sim_step", {"steps": 8})
    n2 = st.overlay.frames.shape[0]
    assert n2 > n1                          # the overlay grows live
    assert len(s["clips"]) == 2             # motion + live overlay
    assert st.overlay.contacts.shape == (n2, model.num_bodies)
    s = st.handle("sim_stop", {})
    assert st.overlay is not None           # overlay survives the stop
    with pytest.raises(StudioError):
        st.sim_stop()


def test_live_viewport_payload_over_http(model):
    # The browser page IS the live 3D viewport: it must ship the
    # playback/render loop, and /api/state must carry the animated
    # skeleton (per-frame body positions) + terrain it renders.
    st = Studio(model, walking_clip(seed=2))
    server = make_server(st, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        import http.client
        host, port = server.server_address
        conn = http.client.HTTPConnection(host, port, timeout=30)
        conn.request("GET", "/")
        page = conn.getresponse().read().decode()
        for marker in ("render()", "body_pos", "setInterval", "proj(",
                       "toggleLive"):
            assert marker in page
        conn.request("GET", "/api/state")
        state = json.loads(conn.getresponse().read())
        bp = np.asarray(state["clips"][0]["body_pos"])
        assert bp.ndim == 3 and bp.shape[0] > 1   # T frames of NB x 3
        assert state["terrain"] is not None and state["fps"] > 0
        conn.close()
    finally:
        server.shutdown()
        server.server_close()
