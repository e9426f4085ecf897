"""Coordinate transforms: normalized grid coords -> pixel-space source coords.

TPU-native re-design of the reference's device helpers
(cosine_sampler_2d_kernel.cu:43-236): pure jnp, fully vectorized, and written
so that *JAX autodiff of these functions agrees with the closed-form
multiplier* the reference propagates by hand (``grid_sampler_unnormalize_
set_grad`` et al.).  Every function returns ``(coord, mult)`` where ``mult``
is d(coord)/d(normalized coord) treated as piecewise-constant — exactly the
``gix_mult`` chain-rule factor of the reference (kernel.cu:72-87, 98-116,
144-171).

Semantics notes (each deviation is deliberate and documented):

* multicell (the PIXEL offset trick): with ``align_corners`` the addressable
  size shrinks by one texel before the standard unnormalize formula, then the
  per-cell offset in [0, 1) is added (kernel.cu:56-65).  Reproduced exactly.

* reflection + align_corners: the reference reflects over ``2*(size-2)``
  (kernel.cu:185) regardless of ``multicell`` — which is the multicell-
  adjusted span.  We derive the span from the *effective* size instead:
  ``2*(size-2)`` when multicell (matches the reference) and ``2*(size-1)``
  when not (matches torch.grid_sample; the reference's always-(size-2)
  behavior in non-multicell mode is reproduced nowhere because it is
  untested upstream and inconsistent with its own bilinear/no-multicell
  grid_sample parity claim, README.md:26-27).

* the reference's 2D *forward* hardcodes align_corners=True
  (kernel.cu:307-308) while its backward respects the flag — an upstream
  fwd/bwd inconsistency for align_corners=False.  We respect the flag
  everywhere (consistent with its 3D kernels, cosine_sampler_3d_kernel.cu:
  299-301).
"""

from __future__ import annotations

import jax.numpy as jnp


def unnormalize(coord, size: int, align_corners: bool, multicell: bool, offset):
    """[-1, 1] normalized coord -> pixel coord, plus the d(pixel)/d(norm) scale.

    Mirrors grid_sampler_unnormalize(_set_grad) (kernel.cu:53-87) including
    the multicell size adjustment.  ``offset`` broadcasts against ``coord``
    (per-cell shift in pixels).
    """
    eff = size - 1 if (align_corners and multicell) else size
    if align_corners:
        scale = (eff - 1) / 2.0
        out = (coord + 1.0) * scale + offset
    else:
        scale = eff / 2.0
        out = ((coord + 1.0) * eff - 1.0) / 2.0 + offset
    mult = jnp.full_like(coord, scale)
    return out, mult


def clip_coordinates(coord, size: int):
    """Clamp to [0, size-1]; gradient is zero at and beyond the borders.

    Matches clip_coordinates_set_grad (kernel.cu:98-116): borders count as
    out-of-bounds for the gradient (coord <= 0 or coord >= size-1 -> 0).
    Written with jnp.where so JAX autodiff reproduces the same multiplier.
    """
    hi = float(size - 1)
    inside = (coord > 0.0) & (coord < hi)
    out = jnp.where(coord <= 0.0, 0.0, jnp.where(coord >= hi, hi, coord))
    mult = inside.astype(coord.dtype)
    return out, mult


def reflect_coordinates(coord, twice_low: int, twice_high: int):
    """Reflect into [twice_low/2, twice_high/2]; gradient is the fold parity.

    Matches reflect_coordinates_set_grad (kernel.cu:144-171).
    """
    if twice_low == twice_high:
        return jnp.zeros_like(coord), jnp.zeros_like(coord)
    mn = twice_low / 2.0
    span = (twice_high - twice_low) / 2.0
    shifted = coord - mn
    sign = jnp.where(shifted < 0.0, -1.0, 1.0).astype(coord.dtype)
    mag = jnp.abs(shifted)
    # fmod keeps the sign of mag (non-negative here), like std::fmod.
    extra = jnp.mod(mag, span)
    flips = jnp.floor(mag / span)
    even = jnp.mod(flips, 2.0) == 0.0
    out = jnp.where(even, extra + mn, span - extra + mn)
    mult = jnp.where(even, sign, -sign)
    return out, mult


def compute_source_coords(
    coord,
    size: int,
    padding_mode: str,
    align_corners: bool,
    multicell: bool,
    offset,
    strict: bool = False,
):
    """Full transform: unnormalize -> (clip | reflect+clip), with chain multiplier.

    Mirrors grid_sampler_compute_source_index_set_grad (kernel.cu:211-236).
    Returns ``(pixel_coord, mult)`` with ``mult = d(pixel_coord)/d(coord)``
    a.e. (the product of the unnormalize scale and the border/reflection
    fold factors).  ``strict`` reproduces the reference's always-
    ``2*(size-2)`` align-corners reflection span even in non-multicell mode
    (kernel.cu:185; see SamplerConfig.strict_reference).
    """
    x, mult = unnormalize(coord, size, align_corners, multicell, offset)
    if padding_mode == "zeros":
        return x, mult
    if padding_mode == "border":
        x, mc = clip_coordinates(x, size)
        return x, mult * mc
    if padding_mode == "reflection":
        eff = size - 1 if (multicell or strict) else size
        if align_corners:
            x, mr = reflect_coordinates(x, 0, 2 * (eff - 1))
        else:
            x, mr = reflect_coordinates(x, -1, 2 * size - 1)
        x, mc = clip_coordinates(x, size)
        return x, mult * mr * mc
    raise ValueError(
        f"unknown padding_mode {padding_mode!r}; expected zeros|border|reflection"
    )


def multicell_offsets(n_cells: int, multicell: bool, dtype) -> jnp.ndarray:
    """Per-cell lattice shifts: linspace(0, 1 - 1/N, N) if multicell else zeros.

    The reference recomputes this on the host and copies it to the device on
    every call (modules_2d.py:24-27); here it is a pure function folded into
    the jitted program (constant-folded by XLA).
    """
    if not multicell:
        return jnp.zeros((n_cells,), dtype=dtype)
    return jnp.linspace(0.0, 1.0 - 1.0 / n_cells, n_cells, dtype=dtype)
