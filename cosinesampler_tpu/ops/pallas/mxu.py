"""Exact f32 matmuls against bf16-representable matrices in fewer MXU passes.

The v2 fused kernels (fused2d.py, fused3d.py) spend their MXU time on
contractions where ONE operand is a one-hot 0/1 selector matrix (the shared
3x3[x3]-patch gather panels).  0/1 values are exactly representable in
bfloat16, so the only precision at stake is the other (data) operand.

``jax.lax.Precision.HIGHEST`` forces the f32-faithful 6-pass bf16 algorithm
on the MXU.  But an f32 number splits EXACTLY into three bf16 terms
(8 + 8 + 8 explicit mantissa bits cover f32's 24):

    t0 = bf16(m);  t1 = bf16(m - t0);  t2 = bf16(m - t0 - t1) == m - t0 - t1

(the residual after two splits has <= 8 significant bits left, so the third
cast is lossless, and each subtraction is exact in f32 by Sterbenz's lemma).
Contracting each term against the exact selector at DEFAULT precision (one
MXU pass each) and summing in f32 reproduces the HIGHEST result to final-
addition rounding -- at 3 passes instead of 6.

A 2-pass split (~2^-18 relative error, ~4e-6) is exposed for callers that
trade the last bits for another 1.5x of MXU throughput; the library default
is the exact 3-pass split.

This replaces the CUDA reference's reliance on native f32 FMA throughput
(cosine_sampler_2d_kernel.cu:340-354 does scalar f32 math per thread): on
TPU the gather IS a matmul, so matmul precision strategy is the perf knob.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Number of bf16 passes for the one-hot contractions in the v2 kernels.
# 3 = exact f32 (default); 2 = ~4e-6 relative error, ~1.5x faster MXU;
# >=6 falls back to Precision.HIGHEST.
EXACT_PASSES = 3


def split_bf16(m, passes: int):
    """Split f32 array ``m`` into ``passes`` bf16 terms summing to ~m.

    With passes >= 3 the split is exact for finite f32 inputs.
    """
    terms = []
    rem = m
    for i in range(passes):
        t = rem.astype(jnp.bfloat16)
        terms.append(t)
        if i + 1 < passes:
            rem = rem - t.astype(jnp.float32)
    return terms


def data_cast(data, cfg=None):
    """Kernel-side dtype of the cell data operand.

    bfloat16 stays bfloat16 — the TPU-native analog of the reference's
    half dispatch (AT_DISPATCH_FLOATING_TYPES_AND_HALF,
    cosine_sampler_2d_kernel.cu:905): the data rides the DMA pipelines at
    half the bytes and needs ONE MXU pass against the (exactly-bf16)
    selectors instead of the 3-pass exact split.  ``cfg.precision ==
    "bf16"`` opts wider inputs into the same treatment (f32 master
    weights, bf16 compute — the idiomatic TPU mixed-precision shape).
    Everything else (f32, f16 — bf16 would truncate f16's 10-bit
    mantissa) computes in f32.
    """
    if data.dtype == jnp.bfloat16:
        return data
    if cfg is not None and cfg.precision == "bf16":
        return data.astype(jnp.bfloat16)
    return data.astype(jnp.float32)


def data_terms(m, passes: int):
    """MXU terms of the data operand ``m`` for a one-hot contraction.

    bf16 data IS its own single exact term (see data_cast); passes == 1
    on wider data means "quantize to bf16" (the precision='bf16' mode);
    f32 otherwise splits into ``passes`` bf16 terms via split_bf16.
    Accumulation is always f32 (preferred_element_type in
    onehot_dot_terms)."""
    if m.dtype == jnp.bfloat16:
        return [m]
    if passes == 1:
        return [m.astype(jnp.bfloat16)]
    return split_bf16(m, passes)


def onehot_dot_terms(terms, a, dims):
    """dot_general(sum(terms), a, dims) for pre-split bf16 ``terms``.

    Use when the data operand is loop-invariant (split once, contract against
    many selector panels).  ``a`` must be exactly bf16-representable.
    """
    ab = a.astype(jnp.bfloat16)
    acc = None
    for t in terms:
        part = jax.lax.dot_general(t, ab, dims,
                                   preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc


def onehot_dot(m, a, dims, passes: int | None = None):
    """dot_general(m, a, dims) with f32 accuracy in ``passes`` MXU passes.

    ``a`` must be exactly bf16-representable (e.g. a 0/1 one-hot selector);
    ``m`` is arbitrary f32 (or bf16: single pass).  Accumulation is f32
    (preferred_element_type).  ``passes == 1`` quantizes f32 ``m`` to
    bf16 (see data_terms).
    """
    if passes is None:
        passes = EXACT_PASSES
    if passes >= 6:
        return jax.lax.dot_general(
            m, a, dims, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    return onehot_dot_terms(data_terms(m, passes), a, dims)


def passes_for(cfg) -> int:
    """MXU pass count for ``SamplerConfig.precision``.

    "exact" defers to the module default ``EXACT_PASSES`` (3 unless an
    expert overrides it before tracing); "fast" is the 2-pass split
    (~4e-6 relative error); "bf16" is single-pass on bf16-quantized data
    (~2e-3 relative error, half DMA when the host-side layouts inherit
    the dtype); "highest" forces XLA's 6-pass algorithm.
    """
    return {"exact": EXACT_PASSES, "fast": 2, "bf16": 1,
            "highest": 6}[cfg.precision]
