"""Extract kinematic specs from the reference's bundled URDFs.

Reads each URDF through graphik_tpu's own parser and dumps the minimal
kinematic description (joints: type, topology, origin, axis, limits) as
JSON into graphik_tpu/robots/specs/. Meshes and visual/collision data are
dropped - the IK framework only needs kinematics.

Run from the repo root:  python tools/extract_models.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphik_tpu.io.urdf import UrdfModel

REFERENCE_URDF_DIR = "/root/reference/graphik/robots/urdfs"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "graphik_tpu",
    "robots",
    "specs",
)

MODELS = [
    "ur10_mod",
    "kuka_iiwr",
    "kuka_lwr",
    "lwa4d",
    "lwa4p",
    "panda_arm",
    "panda_arm_truncated",
    "jaco2arm6DOF_no_hand",
]


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in MODELS:
        path = os.path.join(REFERENCE_URDF_DIR, name + ".urdf")
        model = UrdfModel.parse(path)
        spec = {
            "name": model.name,
            "links": model.links,
            "joints": [
                {
                    "name": j.name,
                    "type": j.jtype,
                    "parent": j.parent,
                    "child": j.child,
                    "origin": np.round(j.T_origin, 12).tolist(),
                    "axis": j.axis.tolist(),
                    "limit_lower": j.limit_lower,
                    "limit_upper": j.limit_upper,
                }
                for j in model.joints
            ],
        }
        out = os.path.join(OUT_DIR, name + ".json")
        with open(out, "w") as f:
            json.dump(spec, f, indent=1)
        tpl = model.template()
        print(f"{name}: {len(model.joints)} joints -> n={tpl.n}, ee={tpl.ee.tolist()}")


if __name__ == "__main__":
    main()
