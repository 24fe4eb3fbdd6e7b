"""Multi-device scaling: scene-batched execution over a jax Mesh."""

from pbr3d.parallel.sharding import (
    scene_mesh,
    batched_global_carve,
    shard_scene_batch,
)

__all__ = ["scene_mesh", "batched_global_carve", "shard_scene_batch"]
