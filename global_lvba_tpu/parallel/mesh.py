"""Device mesh construction for the distributed BA engine.

The parallelism axes (SURVEY.md §2.3):
  * 'factors'  — data parallelism over plane-factor voxels / reprojection
    observations; gradients and Hessians reduce with psum (the TPU-native
    generalization of the reference's 16-thread divide_thread reduction,
    /root/reference/include/BALM/bavoxel.hpp:597-639);
  * 'frames'   — state parallelism over keyframe blocks of the (6W, 6W)
    reduced system (used by the distributed solve).

Communication rides XLA collectives over ICI when the mesh maps to a real
TPU slice; under tests it maps to virtual CPU devices.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("factors",),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    devs = devs[:n]
    if shape is None:
        if len(axis_names) == 1:
            shape = (n,)
        elif len(axis_names) == 2:
            # favor the factor axis
            f = n
            s = 1
            while f % 2 == 0 and s < 2:
                f //= 2
                s *= 2
            shape = (f, s)
        else:
            raise ValueError("provide an explicit shape for >2 axes")
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Multi-host initialization (jax.distributed) — the NCCL/MPI analogue.

    On a TPU pod slice the arguments are auto-detected from the environment;
    pass them explicitly for CPU multi-process simulation.  After this,
    make_mesh() sees every chip of every host and the factor/keyframe
    shardings reduce over ICI within hosts and DCN across hosts."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
