"""Generate bundled .urdf assets from the extracted kinematic specs.

The reference ships 8 robot URDFs (graphik/robots/urdfs/*.urdf). This repo
ships the same robots as extracted JSON kinematic specs
(graphik_tpu/robots/specs); this tool re-serializes each spec-built
template to URDF XML (io/urdf.template_to_urdf) so the XML ingestion path
has real on-disk .urdf files to parse - generated from our own data, not
copied. Regenerate after changing specs:

    python tools/make_urdf_assets.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

from graphik_tpu.io import urdf as urdf_io
from graphik_tpu.robots import library

LOADERS = {
    "ur10": library.load_ur10,
    "kuka_iiwr": library.load_kuka,
    "kuka_lwr": library.load_kuka_lwr,
    "lwa4d": library.load_schunk_lwa4d,
    "lwa4p": library.load_schunk_lwa4p,
    "panda": library.load_panda,
    "panda_truncated": library.load_panda_truncated,
    "jaco": library.load_jaco,
}


def main():
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "graphik_tpu", "io", "assets",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name, loader in LOADERS.items():
        tpl = loader()[0]
        xml = urdf_io.template_to_urdf(tpl, name=name)
        path = os.path.join(out_dir, f"{name}.urdf")
        with open(path, "w") as f:
            f.write(xml + "\n")
        print(f"wrote {path} ({tpl.n} joints)")


if __name__ == "__main__":
    main()
