from .sharding import (DCN_AXIS, ICI_AXIS, POINTS_AXIS, make_hybrid_mesh,
                       make_mesh, shard_pinn_step, sharded_fused_features,
                       sharded_sample)

__all__ = ["POINTS_AXIS", "DCN_AXIS", "ICI_AXIS", "make_mesh",
           "make_hybrid_mesh", "shard_pinn_step", "sharded_fused_features",
           "sharded_sample"]
