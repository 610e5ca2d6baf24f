"""Character model tests: structure, round trips, golden FK parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from parc_tpu.anim import char_model as cm
from parc_tpu.data.humanoid import humanoid_spec


@pytest.fixture(scope="module")
def model():
    return humanoid_spec().build()


def test_structure(model):
    assert model.num_bodies == 15
    assert model.dof_size == 28
    assert model.body_names[0] == "pelvis"
    # 8 spherical + 4 hinge + 2 fixed + root
    types = list(model.joint_types)
    assert types.count(cm.SPHERICAL) == 8
    assert types.count(cm.HINGE) == 4
    assert types.count(cm.FIXED) == 2
    assert types.count(cm.ROOT) == 1
    total_mass = float(jnp.sum(model.body_mass))
    assert 30.0 < total_mass < 70.0, total_mass


def test_dof_rot_round_trip(model):
    rng = np.random.default_rng(0)
    dof = jnp.asarray(rng.uniform(-0.9, 0.9, size=(32, 28)).astype(np.float32))
    jr = cm.dof_to_rot(model, dof)
    assert jr.shape == (32, 14, 4)
    dof2 = cm.rot_to_dof(model, jr)
    np.testing.assert_allclose(np.asarray(dof2), np.asarray(dof), atol=1e-4)


def test_fk_shapes_and_root(model):
    rng = np.random.default_rng(1)
    dof = jnp.asarray(rng.uniform(-0.5, 0.5, size=(8, 28)).astype(np.float32))
    root_pos = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    root_rot = jnp.tile(jnp.asarray([0.0, 0, 0, 1]), (8, 1))
    jr = cm.dof_to_rot(model, dof)
    pos, rot_ = cm.forward_kinematics(model, root_pos, root_rot, jr)
    assert pos.shape == (8, 15, 3)
    assert rot_.shape == (8, 15, 4)
    np.testing.assert_allclose(np.asarray(pos[:, 0]), np.asarray(root_pos), atol=1e-6)


def _load_reference_model(reference_root):
    import sys
    import types

    torch = pytest.importorskip("torch")
    if "trimesh" not in sys.modules:
        sys.modules["trimesh"] = types.ModuleType("trimesh")
    if str(reference_root) not in sys.path:
        sys.path.insert(0, str(reference_root))
    from anim import kin_char_model as ref_cm  # noqa: E501

    ref = ref_cm.KinCharModel("cpu")
    ref.load_char_file(str(reference_root / "data" / "assets" / "humanoid.xml"))
    return torch, ref


def test_golden_fk_vs_reference(reference_root, model):
    torch, ref = _load_reference_model(reference_root)
    rng = np.random.default_rng(2)
    dof = rng.uniform(-0.8, 0.8, size=(16, 28)).astype(np.float32)
    root_pos = rng.normal(size=(16, 3)).astype(np.float32)
    root_em = (0.3 * rng.normal(size=(16, 3))).astype(np.float32)

    from parc_tpu.utils import rotation as rot
    root_rot_j = rot.exp_map_to_quat(jnp.asarray(root_em))

    t_dof = torch.from_numpy(dof)
    ref_jr = ref.dof_to_rot(t_dof)
    import util.torch_util as ref_tu
    ref_rr = ref_tu.exp_map_to_quat(torch.from_numpy(root_em))
    ref_pos, ref_rot = ref.forward_kinematics(
        torch.from_numpy(root_pos), ref_rr, ref_jr)

    jr = cm.dof_to_rot(model, jnp.asarray(dof))
    # joint rotations identical (up to sign)
    dots = np.abs(np.sum(np.asarray(jr) * ref_jr.numpy(), axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)

    pos, rot_w = cm.forward_kinematics(
        model, jnp.asarray(root_pos), root_rot_j, jr)
    np.testing.assert_allclose(np.asarray(pos), ref_pos.numpy(), atol=1e-4)
    dots = np.abs(np.sum(np.asarray(rot_w) * ref_rot.numpy(), axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_golden_dof_vel_vs_reference(reference_root, model):
    torch, ref = _load_reference_model(reference_root)
    rng = np.random.default_rng(3)
    dof0 = rng.uniform(-0.5, 0.5, size=(8, 28)).astype(np.float32)
    dof1 = (dof0 + 0.05 * rng.normal(size=(8, 28))).astype(np.float32)
    dt = 1.0 / 30.0

    jr0_ref = ref.dof_to_rot(torch.from_numpy(dof0))
    jr1_ref = ref.dof_to_rot(torch.from_numpy(dof1))
    ref_vel = ref.compute_dof_vel(jr0_ref, jr1_ref, dt)

    jr0 = cm.dof_to_rot(model, jnp.asarray(dof0))
    jr1 = cm.dof_to_rot(model, jnp.asarray(dof1))
    vel = cm.compute_dof_vel(model, jr0, jr1, dt)
    np.testing.assert_allclose(np.asarray(vel), ref_vel.numpy(), atol=1e-3)


def test_mjcf_parse_matches_spec(reference_root, model):
    parsed = cm.load_char_file(
        str(reference_root / "data" / "assets" / "humanoid.xml"))
    assert parsed.body_names == model.body_names
    assert parsed.parent_indices == model.parent_indices
    assert parsed.joint_types == model.joint_types
    np.testing.assert_allclose(np.asarray(parsed.local_translation),
                               np.asarray(model.local_translation), atol=1e-6)
    np.testing.assert_allclose(np.asarray(parsed.dof_limits_lower),
                               np.asarray(model.dof_limits_lower), atol=1e-6)
    np.testing.assert_allclose(np.asarray(parsed.dof_motor_effort),
                               np.asarray(model.dof_motor_effort), atol=1e-6)
    np.testing.assert_allclose(np.asarray(parsed.body_mass),
                               np.asarray(model.body_mass), rtol=1e-5)


def test_mjcf_export_roundtrip():
    """export_mjcf -> parse_mjcf must reproduce the model exactly
    (reference: anim/kin_char_model.py:756-931 MJCF re-export)."""
    import tempfile
    from parc_tpu.data.humanoid import humanoid_spec

    spec = humanoid_spec()
    m1 = spec.build()
    path = tempfile.mktemp(suffix=".xml")
    with open(path, "w") as f:
        f.write(cm.export_mjcf(spec))
    m2 = cm.load_char_file(path)
    assert m1.body_names == m2.body_names
    assert m1.joint_types == m2.joint_types
    assert m1.dof_size == m2.dof_size
    for field in ("local_translation", "dof_limits_lower",
                  "dof_limits_upper", "dof_stiffness", "dof_damping",
                  "body_mass"):
        np.testing.assert_allclose(np.asarray(getattr(m1, field)),
                                   np.asarray(getattr(m2, field)),
                                   rtol=1e-5, atol=1e-6, err_msg=field)


def test_mesh_geom_assets(tmp_path):
    """MJCF mesh assets load natively (OBJ + binary STL) and integrate into
    mass properties, contact points, and surface samples (reference parses
    mesh assets via trimesh, anim/kin_char_model.py:206-449)."""
    import struct as pystruct
    # a unit-ish tetrahedron OBJ
    obj = tmp_path / "tetra.obj"
    obj.write_text("v 0 0 0\nv 0.2 0 0\nv 0 0.2 0\nv 0 0 0.2\n"
                   "f 1 2 3\nf 1 2 4\nf 1 3 4\nf 2 3 4\n")
    # the same 4 triangles as binary STL
    tris = [((0, 0, 0), (0.2, 0, 0), (0, 0.2, 0)),
            ((0, 0, 0), (0.2, 0, 0), (0, 0, 0.2)),
            ((0, 0, 0), (0, 0.2, 0), (0, 0, 0.2)),
            ((0.2, 0, 0), (0, 0.2, 0), (0, 0, 0.2))]
    blob = b"\0" * 80 + pystruct.pack("<I", len(tris))
    for t in tris:
        blob += pystruct.pack("<3f", 0, 0, 1)
        for v in t:
            blob += pystruct.pack("<3f", *v)
        blob += b"\0\0"
    stl = tmp_path / "tetra.stl"
    stl.write_bytes(blob)

    mjcf = tmp_path / "char.xml"
    mjcf.write_text(f"""
<mujoco model="meshchar">
  <asset>
    <mesh name="tet_obj" file="tetra.obj"/>
    <mesh name="tet_stl" file="tetra.stl" scale="2 2 2"/>
  </asset>
  <worldbody>
    <body name="root" pos="0 0 1">
      <freejoint/>
      <geom type="mesh" mesh="tet_obj"/>
      <body name="arm" pos="0.3 0 0">
        <joint name="arm_j" axis="0 1 0" range="-90 90"/>
        <geom type="mesh" mesh="tet_stl" pos="0.1 0 0"/>
      </body>
    </body>
  </worldbody>
  <actuator><motor joint="arm_j" gear="50"/></actuator>
</mujoco>""")
    model = cm.load_char_file(str(mjcf))
    assert model.num_bodies == 2
    spec = cm.parse_mjcf(str(mjcf))
    g0 = spec.bodies[0].geoms[0]
    assert g0.kind == "mesh" and g0.verts.shape == (4, 3)
    # scaled STL mesh: verts span 0.4
    g1 = spec.bodies[1].geoms[0]
    assert np.allclose(g1.verts.max(axis=0) - g1.verts.min(axis=0), 0.4)
    m, com, inertia = g0.mass_properties()
    assert m > 0 and np.all(np.linalg.eigvalsh(inertia) > 0)
    pts, rad = g0.contact_points()
    assert len(pts) >= 4 and np.isfinite(pts).all()
    # surface samples include mesh vertices
    from parc_tpu.utils import geom as geom_lib
    bidx, offs = geom_lib.char_surface_points(spec)
    assert (bidx == 1).sum() > 0
    # FK runs on the built model
    import jax.numpy as jnp
    bp, br = cm.forward_kinematics(
        model, jnp.zeros((1, 3)), jnp.asarray([[0., 0, 0, 1]]),
        jnp.zeros((1, model.num_bodies - 1, 4)).at[..., 3].set(1.0))
    assert np.isfinite(np.asarray(bp)).all()
    # re-export emits an AABB box for the mesh geom
    xml = cm.export_mjcf(spec)
    assert 'type="box"' in xml
