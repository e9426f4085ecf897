"""Interpolation kernels and their derivatives, to arbitrary order.

The reference (cosine_sampler_2d/csrc/cosine_sampler_2d_kernel.cu:239-261)
hand-codes w, w' and w'' for the cosine and smooth-step kernels as
float-typed device functions.  Here each kernel is a single closed-form
family ``w^(k)(t)`` over the fractional coordinate ``t`` in [0, 1]:

* ``cosine``      : w(t) = (1 - cos(pi t)) / 2          (Instant-NGP style)
* ``linear``      : w(t) = t                            ("bilinear"/"trilinear")
* ``smoothstep``  : w(t) = t^2 (3 - 2 t)

All three satisfy the reflection identity ``w(1 - t) = 1 - w(t)``, which is
why the reference's 2D convention (weighting the floor corner by
``w(ix_right - ix)``, kernel.cu:315-326) and its 3D convention (weighting
the ceil corner by ``w(ix - ix_left)``, cosine_sampler_3d_kernel.cu:316-333)
are mathematically identical.  We use the 3D convention everywhere:

    W_1(t) = w(t)         (weight of the +1 / "ceil" corner)
    W_0(t) = 1 - w(t)     (weight of the floor corner)

so that for derivative order k >= 1:

    W_1^(k)(t) = +w^(k)(t),   W_0^(k)(t) = -w^(k)(t).

Unlike the reference, derivatives here are dtype-faithful (the reference
silently computes interpolants in float32 even under double dispatch).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_PI = math.pi

#: canonical kernel names; public API accepts the reference aliases too
KERNELS = ("cosine", "linear", "smoothstep")

_ALIASES = {
    "cosine": "cosine",
    "bilinear": "linear",
    "trilinear": "linear",
    "linear": "linear",
    "smooth-step": "smoothstep",
    "smoothstep": "smoothstep",
}


def canonical_kernel(name: str) -> str:
    """Map a reference kernel name (modules_2d.py:12-18) to its canonical form."""
    try:
        return _ALIASES[name]
    except KeyError:
        raise ValueError(
            f"unknown interpolation kernel {name!r}; expected one of {sorted(_ALIASES)}"
        ) from None


def _sin_halfpi(s):
    """sin(pi/2 * s) for s in [-1, 1]: range-reduced Taylor, |err| < 6e-8.

    The TPU VPU's hardware sin/cos approximations (what Mosaic lowers
    jnp.cos to inside Pallas kernels) are only ~1e-3 accurate; this keeps
    the cosine interpolant at full f32 precision in-kernel.
    """
    u = (_PI / 2) * s
    u2 = u * u
    return u * (1 - u2 / 6 * (1 - u2 / 20 * (1 - u2 / 42 *
                (1 - u2 / 72 * (1 - u2 / 110 * (1 - u2 / 156))))))


def _cos_halfpi(s):
    """cos(pi/2 * s) for s in [-1, 1]: range-reduced Taylor, |err| < 5e-8."""
    u = (_PI / 2) * s
    u2 = u * u
    return 1 - u2 / 2 * (1 - u2 / 12 * (1 - u2 / 30 *
               (1 - u2 / 56 * (1 - u2 / 90 * (1 - u2 / 132)))))


def cos_pi(t):
    """cos(pi t) for t in [0, 1] via cos(pi t) = -sin(pi/2 * (2t - 1))."""
    return -_sin_halfpi(2.0 * t - 1.0)


def sin_pi(t):
    """sin(pi t) for t in [0, 1] via sin(pi t) = cos(pi/2 * (2t - 1))."""
    return _cos_halfpi(2.0 * t - 1.0)


def kernel_weight(kernel: str, t: jnp.ndarray, order: int,
                  precise_trig: bool = False) -> jnp.ndarray:
    """k-th derivative ``w^(k)(t)`` of the interpolant ``w``.

    Args:
      kernel: canonical kernel name ("cosine" | "linear" | "smoothstep").
      t: fractional coordinates, any shape.
      order: derivative order k >= 0 (the reference only ever needs k <= 2;
        our exact arbitrary-order autodiff uses k >= 3 as well).
      precise_trig: replace the backend's sin/cos with the range-reduced
        polynomials above.  Required inside Pallas TPU kernels where the
        hardware transcendentals are ~1e-3 approximations; unnecessary (and
        marginally less exact in f64) under plain XLA.
    """
    if order < 0:
        raise ValueError(f"order must be >= 0, got {order}")
    if kernel == "cosine":
        if precise_trig:
            # w^(k)(t) = -(pi^k/2) cos(pi t + k pi/2), expanded by k mod 4
            m = order % 4
            if order == 0:
                return 0.5 * (1.0 - cos_pi(t))
            amp = 0.5 * _PI**order
            if m == 0:
                return -amp * cos_pi(t)
            if m == 1:
                return amp * sin_pi(t)
            if m == 2:
                return amp * cos_pi(t)
            return -amp * sin_pi(t)
        if order == 0:
            return 0.5 * (1.0 - jnp.cos(_PI * t))
        # d^k/dt^k [-cos(pi t)/2] = -(pi^k / 2) cos(pi t + k pi/2)
        return -0.5 * _PI**order * jnp.cos(_PI * t + order * (_PI / 2))
    if kernel == "linear":
        if order == 0:
            return t
        if order == 1:
            return jnp.ones_like(t)
        return jnp.zeros_like(t)
    if kernel == "smoothstep":
        if order == 0:
            return t * t * (3.0 - 2.0 * t)
        if order == 1:
            return 6.0 * t * (1.0 - t)
        if order == 2:
            return 6.0 - 12.0 * t
        if order == 3:
            return jnp.full_like(t, -12.0)
        return jnp.zeros_like(t)
    raise ValueError(f"unknown canonical kernel {kernel!r}")


def corner_weights(kernel: str, t: jnp.ndarray, order: int,
                   precise_trig: bool = False):
    """Per-axis corner weights ``(W_0^(k)(t), W_1^(k)(t))``.

    ``W_1`` weighs the ceil corner, ``W_0`` the floor corner (see module
    docstring).  Matches the sign folding done per-corner by the reference's
    pos_corners tables (cosine_sampler_2d_kernel.cu:614-627).
    """
    wk = kernel_weight(kernel, t, order, precise_trig=precise_trig)
    if order == 0:
        return 1.0 - wk, wk
    return -wk, wk
