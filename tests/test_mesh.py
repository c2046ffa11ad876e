"""Mesh pipeline tests: COLLADA/OBJ/STL loaders, URDF visual extraction,
and the meshed scene builder (reference urdf_visualization.py:9-121).

The parser is validated against synthetic fixtures generated in-test (so
the suite is self-contained); set GRAPHIK_TPU_MESH_ASSETS to a URDF
meshes/ directory (any standard robot-arm asset set) to additionally
exercise the loaders on real files.
"""

import os

import numpy as np
import pytest

from graphik_tpu.io import mesh as meshio
from graphik_tpu.io.urdf import UrdfModel
from graphik_tpu.utils import visualization as viz

DAE_TEMPLATE = """<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset>
    <unit name="millimeter" meter="{meter}"/>
    <up_axis>{up}</up_axis>
  </asset>
  <library_geometries>
    <geometry id="tri-mesh">
      <mesh>
        <source id="tri-mesh-positions">
          <float_array id="tri-mesh-positions-array" count="9">
            0 0 0  1000 0 0  0 1000 0</float_array>
          <technique_common>
            <accessor source="#tri-mesh-positions-array" count="3" stride="3">
              <param name="X" type="float"/>
              <param name="Y" type="float"/>
              <param name="Z" type="float"/>
            </accessor>
          </technique_common>
        </source>
        <source id="tri-mesh-normals">
          <float_array id="tri-mesh-normals-array" count="9">
            0 0 1  0 0 1  0 0 1</float_array>
          <technique_common>
            <accessor source="#tri-mesh-normals-array" count="3" stride="3"/>
          </technique_common>
        </source>
        <vertices id="tri-mesh-vertices">
          <input semantic="POSITION" source="#tri-mesh-positions"/>
        </vertices>
        {prim}
      </mesh>
    </geometry>
  </library_geometries>
  <library_visual_scenes>
    <visual_scene id="Scene">
      {nodes}
    </visual_scene>
  </library_visual_scenes>
</COLLADA>
"""

TRIANGLES = """<triangles count="1">
  <input semantic="VERTEX" source="#tri-mesh-vertices" offset="0"/>
  <input semantic="NORMAL" source="#tri-mesh-normals" offset="1"/>
  <p>0 0 1 1 2 2</p>
</triangles>"""

POLYLIST = """<polylist count="1">
  <input semantic="VERTEX" source="#tri-mesh-vertices" offset="0"/>
  <vcount>3</vcount>
  <p>0 1 2</p>
</polylist>"""

NODE_ID = '<node id="n0"><instance_geometry url="#tri-mesh"/></node>'


def _write_dae(tmp_path, prim=TRIANGLES, nodes=NODE_ID, meter="0.001",
               up="Z_UP"):
    p = tmp_path / "fixture.dae"
    p.write_text(DAE_TEMPLATE.format(
        prim=prim, nodes=nodes, meter=meter, up=up
    ))
    return str(p)


def test_dae_triangles_units(tmp_path):
    # millimeter document: the 1000-unit triangle must come back in meters
    v, f = meshio.load_dae(_write_dae(tmp_path))
    assert f.shape == (1, 3)
    np.testing.assert_allclose(
        v, [[0, 0, 0], [1, 0, 0], [0, 1, 0]], atol=1e-12
    )


def test_dae_polylist_matches_triangles(tmp_path):
    v1, f1 = meshio.load_dae(_write_dae(tmp_path, prim=TRIANGLES))
    v2, f2 = meshio.load_dae(_write_dae(tmp_path, prim=POLYLIST))
    np.testing.assert_allclose(v1[f1], v2[f2])


def test_dae_node_transforms_compose(tmp_path):
    # nested nodes: parent translate + child 90-degree rotate about z
    nodes = """<node id="p"><translate>0 0 2000</translate>
      <node id="c"><rotate>0 0 1 90</rotate>
        <instance_geometry url="#tri-mesh"/></node></node>"""
    v, f = meshio.load_dae(_write_dae(tmp_path, nodes=nodes))
    # (1000, 0, 0) -> rot z 90 -> (0, 1000, 0) -> +2000 z -> mm scale
    np.testing.assert_allclose(
        v, [[0, 0, 2], [0, 1, 2], [-1, 0, 2]], atol=1e-9
    )


def test_dae_matrix_node_and_instancing(tmp_path):
    # a <matrix> row-major transform + the same geometry instanced twice
    nodes = """<node id="a"><matrix>
        1 0 0 5  0 1 0 0  0 0 1 0  0 0 0 1</matrix>
      <instance_geometry url="#tri-mesh"/></node>
      <node id="b"><instance_geometry url="#tri-mesh"/></node>"""
    v, f = meshio.load_dae(_write_dae(tmp_path, nodes=nodes, meter="1"))
    assert len(v) == 6 and len(f) == 2
    np.testing.assert_allclose(v[:3, 0], [5, 1005, 5])  # translated copy


def test_dae_y_up_conversion(tmp_path):
    v, _ = meshio.load_dae(_write_dae(tmp_path, up="Y_UP", meter="1"))
    # old +y becomes +z (rotation, det +1): (0, 1000, 0) -> (0, 0, 1000)
    np.testing.assert_allclose(
        v, [[0, 0, 0], [1000, 0, 0], [0, 0, 1000]], atol=1e-9
    )


def test_dae_without_scene_uses_all_geometries(tmp_path):
    v, f = meshio.load_dae(_write_dae(tmp_path, nodes="", meter="1"))
    assert len(v) == 3 and len(f) == 1


def test_primitive_meshes_closed_and_sized():
    for v, f, bbox in [
        (*meshio.box_mesh([1, 2, 3]), [1, 2, 3]),
        (*meshio.cylinder_mesh(0.5, 2.0), [1, 1, 2]),
        (*meshio.sphere_mesh(0.7), [1.4, 1.4, 1.4]),
    ]:
        np.testing.assert_allclose(
            v.max(axis=0) - v.min(axis=0), bbox, atol=0.05
        )
        # watertight orientation sanity: signed volume positive
        tris = v[f]
        vol = np.sum(np.einsum(
            "ij,ij->i", tris[:, 0], np.cross(tris[:, 1], tris[:, 2])
        )) / 6.0
        assert vol > 0


def test_obj_stl_round_trip(tmp_path):
    v, f = meshio.box_mesh([0.2, 0.3, 0.4])
    p = tmp_path / "box.obj"
    viz.write_obj([("box", v, f)], str(p))
    v2, f2 = meshio.load_mesh(str(p))
    np.testing.assert_allclose(np.sort(v2, axis=0), np.sort(v, axis=0),
                               atol=1e-6)
    assert len(f2) == len(f)


URDF_WITH_VISUALS = """<robot name="two_link">
  <link name="base">
    <visual>
      <origin xyz="0 0 0.1"/>
      <geometry><box size="0.2 0.2 0.2"/></geometry>
    </visual>
  </link>
  <link name="arm">
    <visual>
      <origin xyz="0 0 0.25" rpy="0 0 0"/>
      <geometry><cylinder radius="0.05" length="0.5"/></geometry>
    </visual>
    <collision>
      <geometry><sphere radius="0.3"/></geometry>
    </collision>
  </link>
  <link name="tip">
    <visual><geometry><mesh filename="{mesh}" scale="2 2 2"/></geometry></visual>
  </link>
  <joint name="j0" type="revolute">
    <parent link="base"/><child link="arm"/>
    <origin xyz="0 0 0.2"/><axis xyz="0 1 0"/>
    <limit lower="-3" upper="3"/>
  </joint>
  <joint name="j1" type="fixed">
    <parent link="arm"/><child link="tip"/>
    <origin xyz="0 0 0.5"/>
  </joint>
</robot>
"""


def _two_link_model(tmp_path):
    mesh_path = tmp_path / "tip.obj"
    v, f = meshio.sphere_mesh(0.05)
    viz.write_obj([("tip", v, f)], str(mesh_path))
    urdf_path = tmp_path / "robot.urdf"
    urdf_path.write_text(URDF_WITH_VISUALS.format(mesh=mesh_path.name))
    return UrdfModel.parse(str(urdf_path))


def test_urdf_visual_extraction(tmp_path):
    m = _two_link_model(tmp_path)
    kinds = sorted(v.kind for v in m.visuals)
    assert kinds == ["box", "cylinder", "mesh"]
    assert [c.kind for c in m.collisions] == ["sphere"]
    assert m.base_dir is not None


def test_urdf_visual_meshes_track_fk(tmp_path):
    m = _two_link_model(tmp_path)
    # rotate j0 by 90 degrees about y: the arm cylinder's center
    # (0, 0, 0.2) + R_y(pi/2) @ (0, 0, 0.25) = (0.25, 0, 0.2)
    groups = m.visual_meshes({"j0": np.pi / 2})
    centers = {n: v.mean(axis=0) for n, v, _ in groups}
    np.testing.assert_allclose(centers["arm"], [0.25, 0, 0.2], atol=1e-6)
    # the tip mesh rides the fixed joint: (0, 0, 0.2) + R @ (0, 0, 0.5)
    np.testing.assert_allclose(centers["tip"], [0.5, 0, 0.2], atol=1e-3)
    # mesh scale doubled the 0.05-radius sphere to 0.1
    tip_v = dict((n, v) for n, v, _ in groups)["tip"]
    assert 0.18 < float(np.ptp(tip_v[:, 1])) < 0.22


def test_urdf_prismatic_link_fk():
    urdf = """<robot name="slider">
      <link name="a"/><link name="b"/>
      <joint name="s" type="prismatic">
        <parent link="a"/><child link="b"/>
        <origin xyz="0 0 0"/><axis xyz="1 0 0"/>
        <limit lower="0" upper="1"/>
      </joint></robot>"""
    m = UrdfModel.parse(urdf)
    fk = m.link_fk({"s": 0.7})
    np.testing.assert_allclose(fk["b"][:3, 3], [0.7, 0, 0])


def test_make_scene_and_render(tmp_path):
    m = _two_link_model(tmp_path)
    groups = viz.make_scene(m, q=np.array([0.5]))
    names = [n for n, _, _ in groups]
    assert any(n.startswith("link_") for n in names)
    assert any(n.startswith("frame_") for n in names)
    assert any(n.startswith("ball_") for n in names)
    assert any(n.startswith("edge_") for n in names)
    ax = viz.visualize_meshes(groups, max_faces=500)
    out = tmp_path / "scene.png"
    ax.figure.savefig(str(out), dpi=40)
    assert out.stat().st_size > 0
    nv, nf = viz.write_obj(groups, str(tmp_path / "scene.obj"))
    assert nv > 0 and nf > 0


def test_resolve_mesh_path_package_prefix(tmp_path):
    sub = tmp_path / "meshes"
    sub.mkdir()
    (sub / "part.stl").write_bytes(b"")
    m = UrdfModel.parse("<robot name='r'/>")
    got = m.resolve_mesh_path(
        "package://some_pkg/meshes/part.stl", mesh_root=str(tmp_path)
    )
    assert got == str(sub / "part.stl")


ASSETS = os.environ.get("GRAPHIK_TPU_MESH_ASSETS")


@pytest.mark.skipif(
    not ASSETS, reason="GRAPHIK_TPU_MESH_ASSETS not set"
)
def test_real_assets_load():
    import glob

    files = sorted(
        glob.glob(os.path.join(ASSETS, "**", "*.dae"), recursive=True)
    )[:8] + sorted(
        glob.glob(os.path.join(ASSETS, "**", "*.stl"), recursive=True)
    )[:4]
    assert files, f"no meshes under {ASSETS}"
    for path in files:
        v, f = meshio.load_mesh(path)
        assert len(v) > 0 and len(f) > 0
        assert np.all(f < len(v))
        # robot-arm parts are sub-3m objects
        assert float(np.ptp(v, axis=0).max()) < 3.0


DAE_INSTANCE_NODE = """<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset><unit name="meter" meter="1"/><up_axis>Z_UP</up_axis></asset>
  <library_geometries>
    <geometry id="g0"><mesh>
      <source id="g0-p">
        <float_array id="g0-pa" count="9">0 0 0  1 0 0  0 1 0</float_array>
        <technique_common>
          <accessor source="#g0-pa" count="3" stride="3">
            <param name="X" type="float"/><param name="Y" type="float"/>
            <param name="Z" type="float"/>
          </accessor>
        </technique_common>
      </source>
      <vertices id="g0-v">
        <input semantic="POSITION" source="#g0-p"/>
      </vertices>
      <triangles count="1">
        <input semantic="VERTEX" source="#g0-v" offset="0"/>
        <p>0 1 2</p>
      </triangles>
    </mesh></geometry>
  </library_geometries>
  <library_nodes>
    <node id="shared"><translate>0 0 3</translate>
      <instance_geometry url="#g0"/></node>
  </library_nodes>
  <library_visual_scenes>
    <visual_scene id="Scene">
      <node id="a"><translate>5 0 0</translate>
        <instance_node url="#shared"/></node>
    </visual_scene>
  </library_visual_scenes>
</COLLADA>
"""


def test_dae_instance_node_indirection(tmp_path):
    """<instance_node> through library_nodes (SketchUp/Blender exports):
    the instanced node's own transform composes under the scene node's."""
    p = tmp_path / "inst.dae"
    p.write_text(DAE_INSTANCE_NODE)
    v, f = meshio.load_dae(str(p))
    assert len(f) == 1
    np.testing.assert_allclose(
        v, [[5, 0, 3], [6, 0, 3], [5, 1, 3]], atol=1e-12
    )


def test_stl_binary_with_solid_header(tmp_path):
    """A binary STL whose 80-byte header begins with 'solid' (and even
    contains the word 'facet') must still parse as binary, not as an
    empty ascii file."""
    import struct

    tri = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    header = b"solid facetted_part exported by cad" + b" " * 45
    body = struct.pack("<I", 2)
    for _ in range(2):
        body += struct.pack("<3f", 0, 0, 1)
        for vtx in tri:
            body += struct.pack("<3f", *vtx)
        body += struct.pack("<H", 0)
    p = tmp_path / "part.stl"
    p.write_bytes(header[:80] + body)
    v, f = meshio.load_stl(str(p))
    assert len(f) == 2 and len(v) == 6
    np.testing.assert_allclose(v[:3], tri, atol=1e-7)
