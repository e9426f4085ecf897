"""Shared per-axis coordinate prep for the shared-support fused kernels.

The v2+ fused generations (fused2d/fused3d/fused3s/fused3w/fused3b) all
exploit the multicell structure: per-cell offsets live in [0, 1), so all N
cells' corners for one query share a 3-texel patch anchored at the shared
``floor(base)``.  This module centralizes the coordinate transform that
anchors the patch and derives the per-cell corner weights, extended beyond
``padding_mode='zeros'`` to ``'border'``:

* border clip is monotone and 1-Lipschitz, so
  ``floor(clip(base+off)) - floor(clip(base))`` stays in {0, 1} and the
  shared 3-texel patch machinery carries over unchanged;
* the derivative chain factor becomes per-cell/per-query:
  ``mult * 1{0 < base+off < size-1}`` (the reference's
  clip_coordinates_set_grad zeroing, cosine_sampler_2d_kernel.cu:98-116);
* corners that the clip pushes against the far texel boundary carry
  exactly-zero weights (``t == 0``), so the zeros-mode one-hot OOB
  masking stays correct as-is.

Reflection is also supported, in a WIDENED frame: the fold can reverse the
per-cell offset direction, so ``floor(fold(base+off)) - floor(fold(base))``
lands in {-1, 0, 1} and the shared patch grows to 4 texels per axis
(shifts -1..2).  Every generation gated on FUSED_PADDING_MODES_WIDE runs
it natively: the VMEM-resident ones (fused2d/fused3d) pay one extra panel,
and the binned/windowed ones (fused2w/3w/3b) widen their windows by one
row/slab via ``front_pad`` (4-shift patches, fp = 3) and bin on the FOLDED
coordinates (`bin_base`) — pinned by tests/test_fused_reflection.py.  Only
fused3s (gated on the narrower FUSED_PADDING_MODES) stays zeros/border;
reflection at its shapes falls through to fused3b / fused3d.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..coords import clip_coordinates, reflect_coordinates, unnormalize
from ..interpolants import corner_weights

#: padding modes the binned shared-support kernels implement
FUSED_PADDING_MODES = ("zeros", "border")
#: padding modes the VMEM-resident shared-support kernels implement
FUSED_PADDING_MODES_WIDE = ("zeros", "border", "reflection")

#: Mosaic sublane tile: in-kernel reshapes splitting/merging the
#: second-minor dim are layout-free only at multiples of this.
SUBLANE = 8

#: Conservative per-buffer VMEM budget the dispatch gates check against
#: (the physical v5e VMEM is 128 MiB, but a kernel holds several buffers
#: plus Mosaic-managed pipeline copies).  Shared by the dispatcher
#: (ops/pallas/__init__) and the generations' adaptive block pickers.
VMEM_BUDGET = 6 * 1024 * 1024


def npad(n: int) -> int:
    """Ensemble size padded to the sublane tile, so the fused kernels'
    reshapes between (…*C*N, Qb) matmul layout and (…, C, N, Qb) blend
    layout are layout-free.  Padded cells carry zero volume (they gather
    and scatter zeros; callers crop gradients before returning)."""
    return -(-n // SUBLANE) * SUBLANE


def n_shifts(cfg) -> int:
    """Texel-patch width per axis: 4 for reflection (fold can reverse the
    offset direction), 3 otherwise."""
    return 4 if cfg.padding_mode == "reflection" else 3


def shift_lo(cfg) -> int:
    """First patch shift relative to the shared floor(base)."""
    return -1 if cfg.padding_mode == "reflection" else 0


def axis_transform(coord, size, cfg, off_col):
    """Per-axis coordinate transform for one query block.

    Returns ``(base, ixn, scale)``: the shared folded anchor coordinate
    (1, Qb), the per-cell folded coordinates (N, Qb), and the per-cell
    d(pixel)/d(normalized) chain factor (scalar for zeros, (N, Qb) for
    border where the clip zeroes it at and beyond the texel borders).
    """
    base_raw, mult = unnormalize(coord, size, cfg.align_corners,
                                 cfg.multicell, 0.0)
    if cfg.padding_mode == "zeros":
        return base_raw, base_raw + off_col, mult[0, 0]
    if cfg.padding_mode == "border":
        base, _ = clip_coordinates(base_raw, size)
        ixn, mc = clip_coordinates(base_raw + off_col, size)
        return base, ixn, mult[0, 0] * mc
    if cfg.padding_mode == "reflection":
        # fold span matches coords.compute_source_coords (incl. the strict
        # always-2*(size-2) quirk, cosine_sampler_2d_kernel.cu:185)
        eff = size - 1 if (cfg.multicell or cfg.strict_reference) else size
        if cfg.align_corners:
            tl, th = 0, 2 * (eff - 1)
        else:
            tl, th = -1, 2 * size - 1
        xb, _ = reflect_coordinates(base_raw, tl, th)
        base, _ = clip_coordinates(xb, size)
        xi, mr = reflect_coordinates(base_raw + off_col, tl, th)
        ixn, mc = clip_coordinates(xi, size)
        return base, ixn, mult[0, 0] * mr * mc
    raise ValueError(
        f"fused kernels support padding modes {FUSED_PADDING_MODES_WIDE}, "
        f"got {cfg.padding_mode!r}")


def cell_weights(base, ixn, scale, cfg):
    """Per-cell corner weights at shifts (0, 1, 2) from the shared floor.

    ``weights[k][j]`` is the (N, Qb) order-k weight each cell contributes
    at patch shift j.  The per-cell floor shift s = floor(ixn) - floor(base)
    is computed exactly like the reference path (floor(base + off),
    kernel.cu:310): deriving it from frac(base) + off instead rounds
    differently at texel boundaries, flipping corners where the second
    derivative is discontinuous.
    """
    fb = jnp.floor(base)
    fxn = jnp.floor(ixn)
    if cfg.padding_mode == "reflection":
        # fold may reverse the offset: s in {-1, 0, 1}, patch shifts -1..2.
        # Note scale**k squares away the fold sign at even orders — correct,
        # the fold is locally affine with slope ±1.
        s = jnp.clip(fxn - fb, -1.0, 1.0)
        t = ixn - (fb + s)
        m = [(s == v).astype(t.dtype) for v in (-1.0, 0.0, 1.0)]
        weights = []
        for k in range(3):
            w0, w1 = corner_weights(cfg.kernel, t, k, precise_trig=True)
            if k > 0:
                w0 = w0 * scale**k
                w1 = w1 * scale**k
            # shift j gets [s == j]*w0 + [s == j-1]*w1
            weights.append((m[0] * w0,
                            m[1] * w0 + m[0] * w1,
                            m[2] * w0 + m[1] * w1,
                            m[2] * w1))
        return weights
    s = jnp.minimum(fxn - fb, 1.0)       # {0, 1}; the ulp case fxn==fb+2
    t = ixn - (fb + s)                   # collapses to t == 1 there
    weights = []
    for k in range(3):
        w0, w1 = corner_weights(cfg.kernel, t, k, precise_trig=True)
        if k > 0:
            w0 = w0 * scale**k
            w1 = w1 * scale**k
        ns = 1.0 - s
        weights.append((ns * w0, ns * w1 + s * w0, s * w1))
    return weights


def bin_base(coord, size, cfg):
    """The folded shared base used for query binning (fused3s/3w/3b).

    Must floor identically to axis_transform's ``base`` so bin membership
    and the in-kernel masks agree — hence the branches below apply the
    SAME float ops to the same input as axis_transform does.
    """
    base, _ = unnormalize(coord, size, cfg.align_corners, cfg.multicell, 0.0)
    if cfg.padding_mode == "border":
        base, _ = clip_coordinates(base, size)
    elif cfg.padding_mode == "reflection":
        eff = size - 1 if (cfg.multicell or cfg.strict_reference) else size
        if cfg.align_corners:
            tl, th = 0, 2 * (eff - 1)
        else:
            tl, th = -1, 2 * size - 1
        xb, _ = reflect_coordinates(base, tl, th)
        base, _ = clip_coordinates(xb, size)
    return base


def front_pad(cfg) -> int:
    """Volume front padding (texels) per binned axis: the window must
    reach ``shift_lo`` texels before the shared floor, so fp = 2 -
    shift_lo (2 for zeros/border, 3 for reflection).  Note nsh - 1 == fp
    in both cases, which the windowed kernels' geometry relies on
    (window rows = gy + fp, overlap spill = fp rows)."""
    return 2 - shift_lo(cfg)
