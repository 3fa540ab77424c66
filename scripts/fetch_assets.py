#!/usr/bin/env python
"""Vendor the Open Duck Mini v2 data assets into the package for standalone use.

The framework resolves robot assets (MJCF scenes, STL meshes, heightfield
PNG, gait-polynomial pickle) from $OPEN_DUCK_ASSETS or the read-only
reference mount (see models/open_duck_mini_v2/constants.py). For deployments
without either, copy them into the package:

    python scripts/fetch_assets.py --src /path/to/Open_Duck_Playground/playground/open_duck_mini_v2
"""

from __future__ import annotations

import argparse
import os
import shutil


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--src",
        default="/root/reference/playground/open_duck_mini_v2",
        help="source directory containing xmls/ and data/",
    )
    args = parser.parse_args()

    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "open_duck_playground_tpu", "models", "open_duck_mini_v2", "assets",
    )
    for sub in ("xmls", "data"):
        src_dir = os.path.join(args.src, sub)
        dst_dir = os.path.join(dst, sub)
        if not os.path.isdir(src_dir):
            raise FileNotFoundError(src_dir)
        shutil.copytree(src_dir, dst_dir, dirs_exist_ok=True)
        print(f"copied {src_dir} -> {dst_dir}")


if __name__ == "__main__":
    main()
