from .sharding import (POINTS_AXIS, make_mesh, shard_pinn_step,
                       sharded_sample)

__all__ = ["POINTS_AXIS", "make_mesh", "shard_pinn_step", "sharded_sample"]
