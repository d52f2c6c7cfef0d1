"""Multi-process jax.distributed smoke test — the DCN-analogue path.

SURVEY §4 mandates multi-host tests via jax.distributed multi-process
simulation on one host.  Two CPU processes form a 2-process cluster
(initialize_distributed), build a global mesh, and run a psum and a
factor-sharded LM step; process 0 asserts the reduction saw both
processes' contributions and the LM result matches the single-process
solve.  Skipped if the port can't bind or spawn fails (CI sandboxes).
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

# slow tier: full-suite runs only (see pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.slow

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np
    import jax.numpy as jnp

    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    from global_lvba_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    devs = jax.devices()
    assert len(devs) == 2 * nproc  # 2 virtual CPU devices per process

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.array(devs).reshape(-1), axis_names=("factors",))

    # cross-process psum over globally sharded data
    n_dev = len(devs)
    rows = 4
    data = np.arange(n_dev * rows, dtype=np.float64).reshape(n_dev, rows)
    sharding = NamedSharding(mesh, P("factors"))
    arrs = [
        jax.device_put(data[d : d + 1], devs[d])
        for d in range(n_dev) if devs[d].process_index == pid
    ]
    garr = jax.make_array_from_single_device_arrays(
        (n_dev, rows), sharding, arrs
    )
    total = jax.jit(lambda x: jnp.sum(x))(garr)
    expect = float(data.sum())
    got = float(total)
    assert abs(got - expect) < 1e-9, (got, expect)

    # factor-sharded LiDAR LM across BOTH processes == single-device solve
    from global_lvba_tpu.factors.padding import buckets_to_device
    from global_lvba_tpu.map.voxelize import build_voxel_map
    from global_lvba_tpu.models.synthetic import make_plane_scene, perturb_poses
    from global_lvba_tpu.parallel.shard import lm_damping_iter_sharded
    from global_lvba_tpu.solver.lm import lm_damping_iter

    scene = make_plane_scene(num_frames=4, points_per_frame=800, seed=0)
    vm = build_voxel_map(
        scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
        voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
    )
    buckets = buckets_to_device(vm, dtype=jnp.float64)
    Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.01, 0.02, seed=1)
    res_loc = lm_damping_iter(
        buckets, jnp.asarray(Rp), jnp.asarray(pp), max_iters=3
    )
    res_mp = lm_damping_iter_sharded(
        buckets, jnp.asarray(Rp), jnp.asarray(pp), mesh, max_iters=3
    )
    dp = float(jnp.abs(res_mp.p - res_loc.p).max())
    assert dp < 1e-9, dp
    if pid == 0:
        print(
            f"MP_OK sum={got} procs={nproc} devices={n_dev} lm_dp={dp:.3g}",
            flush=True,
        )
    """
)


def test_two_process_distributed_psum(tmp_path):
    import socket

    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.getcwd()
    procs = []
    try:
        for pid in range(2):
            procs.append(
                subprocess.Popen(
                    [sys.executable, "-c", _WORKER, str(pid), "2", str(port)],
                    stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
                )
            )
        outs = []
        for p in procs:
            try:
                out, err = p.communicate(timeout=240)
            except subprocess.TimeoutExpired:
                p.kill()
                pytest.skip("jax.distributed multi-process timed out in sandbox")
            outs.append((p.returncode, out.decode(), err.decode()))
        for rc, out, err in outs:
            if rc != 0 and ("UNAVAILABLE" in err or "bind" in err.lower()):
                pytest.skip(f"distributed init unavailable: {err[-200:]}")
            assert rc == 0, err[-2000:]
        assert any("MP_OK" in out for _, out, _ in outs)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
