"""Open Duck Mini v2 robot constants (parity with reference constants.py).

Asset files (MJCF scenes, STL meshes, heightfield PNG, gait-polynomial
pickle) are DATA, not code; they are resolved at runtime from, in order:

1. ``$OPEN_DUCK_ASSETS`` (a directory containing ``xmls/`` and ``data/``)
2. the read-only reference mount ``/root/reference/playground/open_duck_mini_v2``
3. a vendored copy under this package (``assets/``), if present

Use ``scripts/fetch_assets.py`` to vendor assets for standalone deployments.
"""

from __future__ import annotations

import os

_CANDIDATE_ROOTS = [
    os.environ.get("OPEN_DUCK_ASSETS", ""),
    "/root/reference/playground/open_duck_mini_v2",
    os.path.join(os.path.dirname(__file__), "assets"),
]


def asset_root() -> str:
    for root in _CANDIDATE_ROOTS:
        if root and os.path.isdir(os.path.join(root, "xmls")):
            return root
    raise FileNotFoundError(
        "Open Duck Mini v2 assets not found; set $OPEN_DUCK_ASSETS "
        "(see scripts/fetch_assets.py)"
    )


def task_to_xml(task_name: str) -> str:
    """Task name -> scene MJCF path (reference constants.py:28-34).

    Note the reference maps 'rough_terrain' to scene_rough_terrain.xml which
    does not exist (only the backlash rough scene ships); we keep the mapping
    for parity -- selecting it raises FileNotFoundError, as upstream would.
    """
    if task_name == "rough_judge_backlash":
        # generated 64x64 judge hfield: the second-engine gate scene for
        # rough policies (see judge_terrain.py for the root-cause record)
        from .judge_terrain import ensure_judge_scene

        return ensure_judge_scene()
    xmls = os.path.join(asset_root(), "xmls")
    return {
        "flat_terrain": os.path.join(xmls, "scene_flat_terrain.xml"),
        "rough_terrain": os.path.join(xmls, "scene_rough_terrain.xml"),
        "flat_terrain_backlash": os.path.join(xmls, "scene_flat_terrain_backlash.xml"),
        "rough_terrain_backlash": os.path.join(xmls, "scene_rough_terrain_backlash.xml"),
    }[task_name]


def reference_motion_path() -> str:
    return os.path.join(asset_root(), "data", "polynomial_coefficients.pkl")


FEET_SITES = ["left_foot", "right_foot"]
LEFT_FEET_GEOMS = ["left_foot_bottom_tpu"]
RIGHT_FEET_GEOMS = ["right_foot_bottom_tpu"]
FEET_GEOMS = LEFT_FEET_GEOMS + RIGHT_FEET_GEOMS

HIP_JOINT_NAMES = [
    "left_hip_yaw", "left_hip_roll", "left_hip_pitch",
    "right_hip_yaw", "right_hip_roll", "right_hip_pitch",
]
KNEE_JOINT_NAMES = ["left_knee", "right_knee"]

JOINTS_ORDER_NO_HEAD = [
    "left_hip_yaw", "left_hip_roll", "left_hip_pitch", "left_knee", "left_ankle",
    "right_hip_yaw", "right_hip_roll", "right_hip_pitch", "right_knee", "right_ankle",
]

FEET_POS_SENSOR = [f"{site}_pos" for site in FEET_SITES]

ROOT_BODY = "trunk_assembly"

GRAVITY_SENSOR = "upvector"
GLOBAL_LINVEL_SENSOR = "global_linvel"
GLOBAL_ANGVEL_SENSOR = "global_angvel"
LOCAL_LINVEL_SENSOR = "local_linvel"
ACCELEROMETER_SENSOR = "accelerometer"
GYRO_SENSOR = "gyro"
