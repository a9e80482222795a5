"""vampire-tpu: TPU-native (JAX/XLA/Pallas/pjit) multi-task 3D perception framework.

A from-scratch, TPU-first rebuild of the capabilities of cskkxjk/Vampire
("Regulating Intermediate 3D Features for Vision-Centric Autonomous Driving",
AAAI 2024): six surround cameras are encoded by a ResNet-50+FPN, lifted through
a depth-distribution frustum into one ego-centric 3D feature field (SDF/density,
semantics, RGB), and that field is queried + volume-rendered to serve four tasks
simultaneously: Occ3D occupancy, LiDAR point segmentation, BEV map/height/RGB
rendering, and CenterPoint-style 3D detection.

Package layout
  core/       geometry, trilinear field sampling, volume rendering (pure jnp)
  models/     flax modules: ResNet, SECOND-FPN, 3D U-Net, field backbones, det head
  ops/        losses and host ops: lovasz, ms-ssim, focal, target assign, NMS (C++)
  data/       nuScenes input pipeline + synthetic fixtures
  parallel/   mesh / sharding helpers (dp x camera sharding over ICI)
  training/   optax train step, EMA, orbax checkpointing, metrics
  evaluation/ nuScenes submission writers and evaluators
"""

__version__ = "0.1.0"
