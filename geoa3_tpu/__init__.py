"""geoa3_tpu — a TPU-native JAX/Pallas rebuild of GeoA3.

Geometry-Aware Generation of Adversarial Point Clouds (Wen et al., TPAMI 2020)
re-designed for TPU: the victim networks (PointNet, PointNet++ SSG/MSG) run as
pure-JAX programs, the CUDA `pointnet2_ops` extension is replaced by fused
XLA/Pallas point ops, and the C&W-style binary-search attack is compiled into
a single `lax.scan`-ed program batched over (instances x targets) and sharded
across a `jax.sharding.Mesh`.

Layout:
  ops/       point-cloud primitives (kNN, FPS, ball query, grouping, interp)
  models/    victim classifiers + torch checkpoint converter
  losses.py  geometric attack losses (Chamfer/Hausdorff/curvature/...)
  attack/    the GeoA3 attack engine (scan inner loop + binary search)
  data/      .mat providers, synthetic data, augmentations, OBJ/OFF/XYZ IO
  defense.py point-removal defenses (random drop / outlier removal)
  parallel/  device-mesh + sharding helpers
  utils/     meters, config naming, checkpointing
  cli/       argparse entry points mirroring the reference CLIs
"""

__version__ = "0.1.0"

# convenience top-level surface
from geoa3_tpu.attack import AttackConfig, attack, make_attack_fn  # noqa: E402
from geoa3_tpu.models import build_model, make_eval_fn  # noqa: E402

__all__ = [
    "AttackConfig",
    "attack",
    "make_attack_fn",
    "build_model",
    "make_eval_fn",
]
