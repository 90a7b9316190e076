"""surikatoko-tpu: a TPU-native SLAM/SfM engine (JAX/XLA/Pallas/pjit).

A from-scratch re-design of the capabilities of the reference C++ codebase
whigg/surikatoko (Davison MonoSlam EKF + Kanatani bundle adjustment + incremental
multi-view factorization) for TPU hardware: fixed-shape pytree state, masked
dynamic landmark sets, batched/autodiff Jacobians, Pallas kernels for the hot
loops, and `shard_map` collectives for the multi-chip distribution layer the
reference never had.

Layer map (mirrors SURVEY.md section 1):
  geom/      math core        (reference: suriko-engine obs-geom/quat/lin-alg)
  vision/    vision primitives (reference: templ-match, image-proc)
  world/     synthetic worlds  (reference: virt-world/scene-generator)
  models/    engines: monoslam EKF, ba (Kanatani LM+Schur), mvf (incremental SfM)
  ops/       Pallas kernels + batched primitives for the hot paths
  parallel/  mesh + sharded EKF/Schur (new: the reference is single-process)
  io/        config, serialization, stats logging, checkpointing
  utils/     rand/stat/approx helpers
"""

from surikatoko_tpu import config as config

__version__ = "0.1.0"
