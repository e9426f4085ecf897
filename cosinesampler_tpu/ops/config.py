"""Static sampler configuration.

The reference passes four positional flags through every ABI level and maps
them to ints at the Python/C++ boundary (modules_2d.py:4-18).  Here the same
surface is a single hashable frozen dataclass that parameterizes the
custom_vjp/kernels factories (static under jit, cached per-configuration).
"""

from __future__ import annotations

import dataclasses

from .interpolants import canonical_kernel

PADDING_MODES = ("zeros", "border", "reflection")
BACKENDS = ("auto", "xla", "pallas")


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    dim: int                      # 2 or 3
    kernel: str = "cosine"        # canonical: cosine | linear | smoothstep
    padding_mode: str = "zeros"   # zeros | border | reflection
    align_corners: bool = True
    multicell: bool = True
    backend: str = "auto"         # auto | xla | pallas

    def __post_init__(self):
        if self.dim not in (2, 3):
            raise ValueError(f"dim must be 2 or 3, got {self.dim}")
        object.__setattr__(self, "kernel", canonical_kernel(self.kernel))
        if self.padding_mode not in PADDING_MODES:
            raise ValueError(
                f"padding_mode must be one of {PADDING_MODES}, got {self.padding_mode!r}"
            )
        if self.backend not in BACKENDS:
            raise ValueError(f"backend must be one of {BACKENDS}, got {self.backend!r}")
