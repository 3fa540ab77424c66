"""Judge terrain: a rough scene on which BOTH engines are well-posed.

Round-3/4 root-cause (scripts/probe_mj_hfield.py, RESULTS/r4/
probe_mj_hfield.log): real MuJoCo's prism hfield collider ejects the duck
from the home keyframe at the reference PNG's 256x256 resolution (7.8 cm
cells under the small foot meshes) EVEN ON A CONSTANT-ZERO hfield, with
sideways/downward contact normals on foot-mesh edges. At nrow <= 128 it is
stable for all amplitudes up to the scene's 1 cm bump ceiling. The
pathology is therefore resolution-triggered in MuJoCo, not a defect of
either terrain or policy.

This module generates the "judge hfield" named by VERDICT r3 #2: the
roughest terrain on which MuJoCo itself is well-posed — 64x64 cells over
the same 10x10 m extent with the same <=1 cm bump amplitude as the
reference scene (scene_rough_terrain_backlash.xml:22 `size="10 10 .01
0.1"`). Rough policies get their second-engine (real MuJoCo C) acceptance
gate on this scene via `sim2sim_check.py --task rough_judge_backlash`.

The scene directory is generated on demand (deterministic, seed 0) next to
this file; reference robot XML + mesh assets are symlinked from the
resolved asset root, so nothing from the reference is copied into git.
"""

from __future__ import annotations

import os

import numpy as np

from .constants import asset_root

JUDGE_NROW = 64           # probe-verified stable (256 is MuJoCo-pathological)
JUDGE_SEED = 0
_VERSION = "judge-v1-64"  # bump to force regeneration


def judge_heightfield(nrow: int = JUDGE_NROW, seed: int = JUDGE_SEED) -> np.ndarray:
    """[0,1]-normalized smooth random bumps — the canonical terrain recipe;
    scripts/probe_mj_hfield.py imports this so its stability matrix always
    measures the terrain the judge gate ships."""
    rng = np.random.RandomState(seed)
    h = rng.rand(nrow, nrow)
    k = max(nrow // 32, 1)
    if k > 1:
        ker = np.ones(k) / k
        h = np.apply_along_axis(lambda r: np.convolve(r, ker, "same"), 0, h)
        h = np.apply_along_axis(lambda r: np.convolve(r, ker, "same"), 1, h)
    h -= h.min()
    if h.max() > 0:
        h /= h.max()
    return h


def ensure_judge_scene() -> str:
    """Build (idempotently) the judge scene dir; return the scene XML path."""
    root = asset_root()
    src_xmls = os.path.join(root, "xmls")
    out_xmls = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "judge_assets", "xmls")
    scene_path = os.path.join(out_xmls, "scene_rough_judge_backlash.xml")
    stamp = os.path.join(out_xmls, ".version")
    if os.path.exists(scene_path) and os.path.exists(stamp):
        with open(stamp) as f:
            if f.read().strip() == _VERSION:
                return scene_path

    out_assets = os.path.join(out_xmls, "assets")
    os.makedirs(out_assets, exist_ok=True)

    # symlink robot XMLs and mesh/texture assets from the resolved root
    for fn in os.listdir(src_xmls):
        if fn.endswith(".xml") and not fn.startswith("scene_"):
            _force_symlink(os.path.join(src_xmls, fn),
                           os.path.join(out_xmls, fn))
    src_assets = os.path.join(src_xmls, "assets")
    for fn in os.listdir(src_assets):
        _force_symlink(os.path.join(src_assets, fn),
                       os.path.join(out_assets, fn))

    # the judge heightfield PNG (8-bit gray; both engines normalize to
    # [0,1] and scale by the scene's size[2]=0.01 -> <=1 cm bumps)
    from PIL import Image

    h = judge_heightfield()
    png = os.path.join(out_assets, "hfield_judge.png")
    # compiler._load_hfield flips rows (image row 0 = +y); pre-flip so the
    # stored PNG round-trips to the generated grid in world orientation
    Image.fromarray((h[::-1] * 255).astype(np.uint8), "L").save(png)

    # the scene: the reference rough scene with only the hfield asset
    # swapped to the judge PNG (runtime-derived, never committed)
    with open(os.path.join(src_xmls, "scene_rough_terrain_backlash.xml")) as f:
        xml = f.read()
    xml = xml.replace('file="assets/hfield.png"', 'file="assets/hfield_judge.png"')
    xml = xml.replace("rough terrain scene", "rough JUDGE terrain scene")
    with open(scene_path, "w") as f:
        f.write(xml)
    with open(stamp, "w") as f:
        f.write(_VERSION)
    return scene_path


def _force_symlink(src: str, dst: str) -> None:
    if os.path.islink(dst) or os.path.exists(dst):
        os.remove(dst)
    os.symlink(src, dst)
