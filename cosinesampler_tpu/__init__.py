"""cosinesampler_tpu: TPU-native (JAX/Pallas) rebuild of CosineSampler.

A from-scratch, TPU-first framework with the capabilities of
NamGyuKang/CosineSampler: 2D/3D multicell grid sampling with cosine /
linear / smooth-step interpolants, exact derivatives to arbitrary order
(the reference hand-codes three), PINN training workloads, and
multi-device sharding over JAX meshes.
"""

from .ops import (CosineSampler2d, CosineSampler3d, SamplerConfig,
                  cosine_sampler_2d, cosine_sampler_3d, make_sample_plan,
                  sample, sample_features_padded,
                  sample_features_with_derivs)

__version__ = "0.1.0"

__all__ = [
    "CosineSampler2d",
    "CosineSampler3d",
    "SamplerConfig",
    "cosine_sampler_2d",
    "cosine_sampler_3d",
    "sample",
    "sample_features_padded",
    "sample_features_with_derivs",
    "make_sample_plan",
]
