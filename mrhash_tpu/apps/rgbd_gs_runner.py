"""RGB-D + online 3D Gaussian Splatting runner
(mrhash/apps/rgbd_gs_runner.py): same loop as rgbd_runner plus the GS
optimization + GSSavePointCloud outputs."""
from __future__ import annotations

import argparse

from mrhash_tpu.apps.rgbd_runner import main as rgbd_main


def main(config_path, **kw):
    return rgbd_main(config_path, gs=True, **kw)


def run():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config_path", nargs="?",
                    default="configurations/replica.cfg")
    ap.add_argument("--end-frame", type=int, default=None)
    args = ap.parse_args()
    main(args.config_path, end_frame_override=args.end_frame)


if __name__ == "__main__":
    run()
