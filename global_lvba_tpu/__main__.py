"""Command-line entry point.

Replaces the reference's ROS node + launch file
(`roslaunch Global-LVBA lvba.launch`, /root/reference/src/main.cpp:4-11,
launch/lvba.launch):

  python -m global_lvba_tpu run --config config.yaml [--data PATH] [--view]
  python -m global_lvba_tpu info --config config.yaml
  python -m global_lvba_tpu view --out OUT_DIR
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="global_lvba_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    run_p = sub.add_parser("run", help="run the full LVBA refinement pipeline")
    run_p.add_argument("--config", required=True, help="YAML config (reference schema)")
    run_p.add_argument("--data", default=None, help="dataset root (overrides config)")
    run_p.add_argument("--out", default=None, help="output directory")
    run_p.add_argument("--no-resume", action="store_true")
    run_p.add_argument(
        "--view", action="store_true",
        help="open the exported clouds in an interactive viewer after the "
             "run (needs open3d + a display; degrades to a hint otherwise)",
    )

    info_p = sub.add_parser("info", help="print the parsed configuration")
    info_p.add_argument("--config", required=True)

    view_p = sub.add_parser(
        "view", help="open previously exported PCDs in an interactive "
        "viewer (rviz-session analogue; needs open3d + a display)")
    view_p.add_argument("--out", required=True, help="pipeline output dir")

    args = ap.parse_args(argv)

    if args.cmd == "view":
        from .pipeline.viz import launch_viewer

        return 0 if launch_viewer(args.out) else 1

    # cold start IS the user experience for a run-once tool: reuse XLA
    # executables across processes (measured ladder-3: 110.8 s cold vs
    # 9.0 s steady; most of the gap is compiles)
    from .utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from .config import LvbaConfig

    cfg = LvbaConfig.from_yaml(args.config)

    if args.cmd == "info":
        import dataclasses

        print(json.dumps(dataclasses.asdict(cfg), indent=2))
        return 0

    if args.data:
        cfg.data_config.data_path = args.data

    from .pipeline.system import LvbaSystem

    system = LvbaSystem(cfg, out_dir=args.out, resume=not args.no_resume)
    result = system.run_full_pipeline()
    print(json.dumps({k: v for k, v in result.items() if k != "metrics"}, default=float))
    if getattr(args, "view", False):
        from .pipeline.viz import launch_viewer

        launch_viewer(system.out_dir, block=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
