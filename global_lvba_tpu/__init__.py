"""global_lvba_tpu — TPU-native global LiDAR-visual bundle adjustment engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
xuankuzcr/Global-LVBA (reference: /root/reference): global LiDAR trajectory
optimization with BALM-style planar eigenvalue factors over an adaptive voxel
hierarchy, plus joint visual-reprojection + LiDAR-plane-prior bundle
adjustment — replacing Ceres/SiftGPU/std::thread with batched XLA kernels,
Pallas hot-path kernels, and `shard_map`/`pjit` collectives over TPU meshes.

Layer map (mirrors SURVEY.md §7):
  geometry/  SO(3)/SE(3), Brown-Conrady camera, voxel coding
  map/       point-moment algebra, voxelization, planarity refinement
  factors/   lidar plane eigen-factor, reprojection, point-to-plane
  solver/    damped LM, Schur-complement visual BA
  frontend/  SIFT (DoG/descriptors), batched matching, COLMAP db ingest
  tracks/    match-graph components, depth fusion, batched DLT
  pipeline/  stage orchestration (window→anchor→global lidar BA, visual BA)
  parallel/  device mesh, sharded Hessian reduction, distributed Schur
  io/        dataset readers (images, PCD, TUM poses)
  models/    problem families + synthetic scene generators
  ops/       low-level XLA/Pallas kernels (eigh3, segments, matcher, zbuffer)
  utils/     logging, metrics, profiling, checkpoints
  native/    C++ host runtime (PCD parsing, radix sort, union-find)
"""

__version__ = "0.1.0"
