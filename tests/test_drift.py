"""Loop-closure drift correction — the realistic odometry error model.

The reference consumes FAST-LIVO2 odometry (README.md:1-8), whose error is
ACCUMULATED drift (each step's relative pose slightly wrong, error growing
~ sqrt(i) along the trajectory), not the i.i.d. jitter most tests use.
On a closed-loop trajectory the early and late frames observe the same
planes, so global BA has the constraints to remove the drift.

Two regimes measured here (48-frame full circle in the box room):

  * the reference's window->anchor hierarchy (window BA compresses 12
    frames into one anchor; global BA moves only anchors,
    /root/reference/src/lvba_system.cpp:204-410): intra-window pose error
    relative to the anchor is frozen at composition time, so accumulated
    drift is only partially recovered (measured ~2x);
  * DIRECT global BA over all frames — what the TPU engine's factor
    throughput makes affordable at these scales (53 ms/iter at W=512,
    banded Gram beyond W>=1024) where the reference needs the lossy
    compression: recovers the drift ~30x (measured 0.0166 m -> 0.0005 m).
"""

import numpy as np
import pytest

from global_lvba_tpu.config import LvbaConfig
from global_lvba_tpu.models.synthetic import (
    ate_rmse,
    make_plane_scene,
    perturb_poses_drift,
)
from global_lvba_tpu.pipeline.lidar_ba import run_lidar_ba

# slow tier: full-suite runs only (see pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def loop_scene():
    # ang = 0.15 * i closes the circle at i ~ 42; 48 frames revisit the start
    scene = make_plane_scene(num_frames=48, points_per_frame=2500,
                             noise=0.004, seed=11)
    clouds = [scene.points_body[scene.frame_ids == i] for i in range(48)]
    return scene, clouds


def test_drift_grows_along_trajectory(loop_scene):
    scene, _ = loop_scene
    Rn, pn = perturb_poses_drift(scene.R_true, scene.p_true, 0.0015, 0.003,
                                 seed=5)
    err = np.linalg.norm(pn - scene.p_true, axis=1)
    # integrated drift: late-trajectory error well above early error
    assert err[:8].mean() < 0.25 * err[-8:].mean()
    assert ate_rmse(pn, scene.p_true) > 0.01


def test_direct_global_ba_recovers_loop_drift(loop_scene):
    scene, clouds = loop_scene
    Rn, pn = perturb_poses_drift(scene.R_true, scene.p_true, 0.0015, 0.003,
                                 seed=5)
    ate_in = ate_rmse(pn, scene.p_true)

    cfg_h = LvbaConfig()
    cfg_h.window_ba.size = 12
    res_h = run_lidar_ba(clouds, Rn, pn, cfg_h)
    ate_hier = ate_rmse(res_h.p_opt, scene.p_true)

    cfg_g = LvbaConfig()
    cfg_g.window_ba.enable = False
    res_g = run_lidar_ba(clouds, Rn, pn, cfg_g)
    ate_direct = ate_rmse(res_g.p_opt, scene.p_true)

    # the hierarchy helps but freezes intra-window drift (measured ~2x)
    assert ate_hier < 0.75 * ate_in
    # direct global BA closes the loop (measured ~30x; generous margins)
    assert ate_direct < 0.1 * ate_in
    assert ate_direct < 0.25 * ate_hier

    # the global_refine stage (engine extension): hierarchy for robustness
    # + one direct all-frame solve from the composed trajectory must reach
    # direct-solve quality
    cfg_r = LvbaConfig()
    cfg_r.window_ba.size = 12
    cfg_r.global_refine.enable = True
    res_r = run_lidar_ba(clouds, Rn, pn, cfg_r)
    ate_ref = ate_rmse(res_r.p_opt, scene.p_true)
    assert ate_ref < 0.1 * ate_in
    assert ate_ref < 2.0 * ate_direct
    assert any(
        str(g.get("stage")).startswith("refine")
        for g in res_r.stats["global"]
    )
