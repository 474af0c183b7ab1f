"""Pallas TPU kernel: masked (Σgrad, count) feature histograms.

This replaces the XLA segment-sum in gbdt.grow for the hot path — the
component the reference parallelizes hardest (FeatureHistogram
construct/update, learning/tree/FeatureHistogram.java:~200, threaded over
features via MyThreadPool).

Formulation: histogramming is a matmul against an implicit one-hot
matrix, built in VMEM per tile. Layout is feature-major ``binned_T[F, N]``
so the doc axis lands on the 128-wide lane dimension (TPU blocks need the
minor dim to be a multiple of 128). For a feature tile TF × doc tile TN:

    O[b·TF + f, d] = (binned_T[f, d] == b)            # [TF·B, TN] in VMEM
    hist[2, TF·B] += gm[2, TN] ·contract(d)· O        # MXU

where gm rows are (grad·mask, mask). Grid is (feature_tiles, doc_tiles)
with docs minor, so each output block stays resident while all doc tiles
accumulate into it (the canonical revisit pattern).

FLOPs are N·F·B·4 — "wasteful" by a factor of B versus scatter-add, but
they run at MXU speed instead of serialized scatter speed, which is the
entire point on this hardware.

Numerics: the gradient-sum channel goes through the MXU at default
precision (bf16 multiplies, f32 accumulate) — measured ≤0.8% relative
deviation from the exact XLA segment-sum on v5e; the count channel (0/1
products) is EXACT. Split selection (argmax over millions of gain
candidates) is robust to this noise — end-to-end model quality matches
the exact-path CPU runs — and Newton leaf outputs never use the
histogram (they come from exact segment-sums in gbdt.grow.leaf_outputs).

The XLA fallback (segment-sum) stays as the CPU-testable reference path;
`histogram_fn` picks per backend and tests assert agreement.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from ranklib_tpu.utils.backend import on_tpu
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TN = 1024                     # docs per tile (lane multiples)


def _hist_kernel(bins_ref, gm_ref, out_ref):
    """bins: [TF, TN] int32; gm: [R, TN] f32; out: [R, TF*B] f32.

    R = 2·C statistic rows: rows [0, C) are grad·weight channels, rows
    [C, 2C) the (non-negative) weight channels. The single-tree case is
    C = 1; batched forest growth (C bags in lockstep, gbdt.grow.grow_forest)
    shares ONE one-hot build across all 2C rows — the VPU compare work that
    dominates this kernel is amortized C-fold, and the extra rows land on
    MXU sublanes that sit idle in the 2-row case.
    """
    d = pl.program_id(1)

    @pl.when(d == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Child histograms in leaf-wise growth mask out most docs (subtraction
    # trick: only one child is built directly) — skip the one-hot build and
    # matmul entirely for doc tiles whose every weight channel is all zero.
    # The block DMAs still stream, so the floor is HBM bandwidth, not
    # compute. (Weight rows are non-negative, so a plain sum is a valid
    # any-nonzero test; grad rows are grad·weight and vanish with them.)
    R = gm_ref.shape[0]

    @pl.when(jnp.sum(gm_ref[R // 2:, :]) > 0.0)
    def _():
        TF, TN = bins_ref.shape
        FB = out_ref.shape[1]
        B = FB // TF
        # pltpu.repeat TILES the block along sublanes: rep[b·TF + f, d] =
        # bins[f, d]; the sublane's local bin index is its row // TF.
        # Upcast the block FIRST: int16 VMEM loads compile (probed
        # 2026-08-20) and halve the bin matrix's HBM footprint, but
        # sub-32-bit COMPARES still crash the remote Mosaic compiler —
        # everything below must be i32.
        rep = pltpu.repeat(bins_ref[:].astype(jnp.int32), B,
                           axis=0)                             # [TF*B, TN]
        row_bin = jax.lax.broadcasted_iota(jnp.int32, (FB, TN), 0) // TF
        onehot = (rep == row_bin).astype(jnp.float32)
        out_ref[:] += jax.lax.dot_general(
            gm_ref[:], onehot, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


def _tile_features(F: int, B: int) -> int:
    """Feature-tile width: TF·B lane-aligned (multiple of 128), TF a
    sublane-friendly multiple of 8, ≈2048 output lanes. Computed as the
    smallest aligned granularity ≥ the lane target, so odd B (e.g.
    RankBoost's 11 bins) takes the minimal 128-multiple instead of
    walking far past it."""
    import math

    g = 128 // math.gcd(B, 128)          # TF must be a multiple of this
    g = g * 8 // math.gcd(g, 8)          # ... and of 8 (sublanes)
    target = max(1, 2048 // B if B <= 2048 else 1)
    cap = ((F + g - 1) // g) * g         # no tiles far beyond real features
    return min(cap, max(g, (target // g) * g))


def _hist_pallas_rows(binned_T, gm, n_bins: int):
    """Rows-generic Pallas histogram: gm [R, N] statistic rows (first R/2
    rows grad·weight, last R/2 the weights) → [F, B, R]."""
    F, N = binned_T.shape
    R = gm.shape[0]
    B = int(n_bins)
    TF = _tile_features(F, B)
    Fp = ((F + TF - 1) // TF) * TF
    Np = ((N + _TN - 1) // _TN) * _TN
    # pad bin value: B ("matches no one-hot row") when the dtype can hold
    # it; for uint8 at B=256 use 0 — wrapper padding is inert regardless
    # (feature-pad rows are sliced off the output, doc-pad columns carry
    # gm = 0), the sentinel is just belt-and-braces
    cv = B if np.iinfo(binned_T.dtype).max >= B else 0
    if Fp > F:
        binned_T = jnp.pad(binned_T, ((0, Fp - F), (0, 0)),
                           constant_values=cv)
    if Np > N:
        binned_T = jnp.pad(binned_T, ((0, 0), (0, Np - N)),
                           constant_values=cv)
        gm = jnp.pad(gm, ((0, 0), (0, Np - N)))

    grid = (Fp // TF, Np // _TN)
    out = pl.pallas_call(
        _hist_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TF, _TN), lambda f, d: (f, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, _TN), lambda f, d: (0, d),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, TF * B), lambda f, d: (0, f),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, Fp * B), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * (R + 2) * Np * Fp * B, transcendentals=0,
            bytes_accessed=Np * Fp * 4 + R * Np * 4 + R * Fp * B * 4),
    )(binned_T, gm)
    # per-tile columns are bin-major over TF local features: global column
    # j·TF·B + b·TF + f  →  (feature j·TF+f, bin b)
    h = out.reshape(R, Fp // TF, B, TF).transpose(1, 3, 2, 0)  # [tiles,TF,B,R]
    return h.reshape(Fp, B, R)[:F]


@functools.partial(jax.jit, static_argnames=("n_bins",))
def hist_pallas(binned_T, grad, mask, n_bins: int):
    """Masked 2-channel histogram on TPU: [F, B, 2] (sum, count).

    binned_T: [F, N] int32 feature-major bins (bins < n_bins; out-of-range
    bins contribute nothing); grad: [N] f32; mask: [N] bool OR f32 doc
    weights (count channel = Σw, sum channel = Σw·grad — RF bags encode
    with-replacement sampling as integer multiplicities).
    """
    m = mask.astype(jnp.float32)
    gm = jnp.stack([grad * m, m])                              # [2, N]
    return _hist_pallas_rows(binned_T, gm, n_bins)


@functools.partial(jax.jit, static_argnames=("n_bins",))
def hist_multi_pallas(binned_T, grads, weights, n_bins: int):
    """C-bag batched histogram on TPU: [C, F, B, 2].

    grads/weights: [C, N] per-bag pseudo-responses and (non-negative) doc
    weights. One kernel pass serves every bag — the per-element one-hot
    compares (the kernel's VPU bottleneck) are shared across all C bags,
    so the marginal cost of a bag is two extra MXU rows.
    """
    C = grads.shape[0]
    w = weights.astype(jnp.float32)
    gm = jnp.concatenate([grads * w, w], axis=0)               # [2C, N]
    h = _hist_pallas_rows(binned_T, gm, n_bins)                # [F, B, 2C]
    return jnp.stack([h[..., :C], h[..., C:]], axis=-1).transpose(2, 0, 1, 3)


def _hist_radix_kernel(bins_ref, gm_ref, out_ref):
    """Radix-16 histogram: bins factor into (hi, lo) nibbles, so the
    B-way one-hot build (the VPU bottleneck of _hist_kernel: B compares
    per element) becomes two 16-way one-hots (~32 compares) and the
    (hi, lo) cross-product moves onto the MXU:

        out[(c·16 + a)·TF + f, b·TF + f] = Σ_d gm[c,d]·[hi=a]·[lo=b]

    as ONE dense [2·16·TF, TN] × [TN, 16·TF] matmul whose off-diagonal
    feature blocks (f ≠ f′) are waste — factor TF=8 more MXU flops than
    _hist_kernel, but they are perfectly shaped (256×128 out, K=TN) where
    the old kernel's VPU compares were the wall. The diagonal is
    extracted in XLA after the kernel (tiny: [Ftiles, 256, 128]).

    bins: [TF=8, TN] int32 (values ≥ 256 = padding: hi=16 matches no
    row); gm: [2, TN] f32 (grad·w, w); out: [2·16·TF, 16·TF] f32.
    """
    d = pl.program_id(1)

    @pl.when(d == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(jnp.sum(gm_ref[1:, :]) > 0.0)
    def _():
        TF, TN = bins_ref.shape
        # upcast before any compare/shift: int16 loads compile, int16
        # compares crash the remote Mosaic compiler (CLAUDE.md hazards)
        b = bins_ref[:].astype(jnp.int32)
        rep_hi = pltpu.repeat(b >> 4, 16, axis=0)              # [16·TF, TN]
        rep_lo = pltpu.repeat(b & 15, 16, axis=0)
        row16 = jax.lax.broadcasted_iota(jnp.int32, (16 * TF, TN), 0) // TF
        oh_hi = (rep_hi == row16).astype(jnp.float32)
        oh_lo = (rep_lo == row16).astype(jnp.float32)
        A = jnp.concatenate([oh_hi * gm_ref[0:1, :],
                             oh_hi * gm_ref[1:2, :]], axis=0)  # [2·16·TF, TN]
        out_ref[:] += jax.lax.dot_general(
            A, oh_lo, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


_RADIX_TF = 8                  # 16·TF = 128 output lanes exactly


def _env_radix_tn() -> int:
    import os

    return int(os.environ.get("RANKLIB_TPU_RADIX_TN", "4096"))


# Doc-tile width of the radix kernel, resolved ONCE at import (changing
# the env var mid-process would not retrace the default-tn jit cache, so
# late changes must not pretend to work). Larger tiles amortize per-
# invocation grid overhead at the price of VMEM: intermediates are
# ~2.2 KB/doc (two [128, TN] one-hots + the [256, TN] A block), so
# 4096 ≈ 9 MB of the ~16 MB budget — the measured sweet spot on v5e
# (tools/exp_radix_tn.py, 2026-08-19: 3.44 / 2.95 / 2.59 ms per full
# bench-shape pass at TN = 1024 / 2048 / 4096; 8192 would blow VMEM).
# Explicit per-call override: the ``tn`` static arg.
_RADIX_TN = _env_radix_tn()


@functools.partial(jax.jit, static_argnames=("n_bins", "tn"))
def hist_pallas_radix(binned_T, grad, mask, n_bins: int,
                      tn: int | None = None):
    """Radix-16 variant of hist_pallas for B = 256 (the GBDT default).

    Same contract as hist_pallas: [F, B, 2] (Σw·grad, Σw). Counts exact;
    grad sums at MXU default precision like the one-hot kernel.
    ``tn``: doc-tile override for probes (default: module _RADIX_TN).
    """
    assert n_bins == 256, "radix kernel is specialized to B = 256"
    F, N = binned_T.shape
    TF = _RADIX_TF
    _TN = _RADIX_TN if tn is None else tn
    Fp = ((F + TF - 1) // TF) * TF
    Np = ((N + _TN - 1) // _TN) * _TN
    # same pad-value rule as _hist_pallas_rows: the sentinel n_bins when
    # the dtype holds it, else 0 (wrapper padding is inert either way —
    # pad features slice off via the diagonal extraction's [:F], pad docs
    # carry gm = 0)
    cv = n_bins if np.iinfo(binned_T.dtype).max >= n_bins else 0
    if Fp > F:
        binned_T = jnp.pad(binned_T, ((0, Fp - F), (0, 0)),
                           constant_values=cv)
    m = mask.astype(jnp.float32)
    gm = jnp.stack([grad * m, m])
    if Np > N:
        binned_T = jnp.pad(binned_T, ((0, 0), (0, Np - N)),
                           constant_values=cv)
        gm = jnp.pad(gm, ((0, 0), (0, Np - N)))

    Ft = Fp // TF
    grid = (Ft, Np // _TN)
    out = pl.pallas_call(
        _hist_radix_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TF, _TN), lambda f, d: (f, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _TN), lambda f, d: (0, d),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * 16 * TF, 16 * TF), lambda f, d: (f, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ft * 2 * 16 * TF, 16 * TF),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Ft * (2 * 16 * TF) * (16 * TF) * Np,
            transcendentals=0,
            bytes_accessed=Np * Fp * 4 + 2 * Np * 4
            + Ft * 2 * 16 * TF * 16 * TF * 4),
    )(binned_T, gm)
    # rows (c·16 + a)·TF + f, cols b·TF + f′ → keep the f = f′ diagonal
    h = out.reshape(Ft, 2, 16, TF, 16, TF)
    diag = jnp.diagonal(h, axis1=3, axis2=5)       # [Ft, 2, hi, lo, TF]
    return diag.transpose(0, 4, 2, 3, 1).reshape(Fp, 256, 2)[:F]


def hist_xla(binned_T, grad, mask, n_bins: int):
    """Reference path: one segment-sum (runs everywhere, incl. CPU).

    Bins upcast to i32 FIRST: with uint8 storage, ``binned < B`` at
    B = 256 would cast the weak literal INTO uint8 (wrapping to 0) and
    silently zero the keep mask — the device-storage-narrowing footgun
    (found by test_mart_learns when uint8 bins landed)."""
    F, N = binned_T.shape
    B = int(n_bins)
    binned = binned_T.T.astype(jnp.int32)
    ids = (jnp.arange(F, dtype=jnp.int32)[None, :] * B
           + jnp.minimum(binned, B - 1)).reshape(-1)
    keep = (binned < B).reshape(-1)
    m = mask.astype(jnp.float32)          # bool mask or f32 doc weights
    g = grad * m
    data = jnp.stack(
        [jnp.broadcast_to(g[:, None], (N, F)).reshape(-1),
         jnp.broadcast_to(m[:, None], (N, F)).reshape(-1)], axis=-1)
    data = jnp.where(keep[:, None], data, 0.0)
    h = jax.ops.segment_sum(data, ids, num_segments=F * B)
    return h.reshape(F, B, 2)


def hist_multi_xla(binned_T, grads, weights, n_bins: int):
    """Reference path for the batched histogram: sequential scan of the
    2-channel segment-sum over bags (lax.map bounds the [N·F] temporary to
    one bag's worth — a vmap would materialize all C at once)."""

    def one(gw):
        g, w = gw
        return hist_xla(binned_T, g, w, n_bins)

    return jax.lax.map(one, (grads, weights.astype(jnp.float32)))


def _hist_auto(binned_T, grad, mask, n_bins: int):
    """Pallas ONLY at B = 256 — the single width the remote Mosaic
    compiler accepts for the histogram kernels (width sweep 2026-08-20,
    tools/exp_mosaic_reprobe.py: B ∈ {32, 64, 128, 192, 512} ALL fail;
    B=11 reproduced the hang class earlier). B=128 is reachable at the
    DEFAULT -tc whenever a dataset has 9..128 distinct values per
    feature (thresholds_from_uniques pads the grid width to a
    128-multiple), so a %128 gate would crash real small/categorical
    runs (review finding). Everything non-256 takes the XLA segment-sum,
    which is cheap at those widths anyway."""
    if n_bins == 256:
        # the GBDT default: radix-16 measured 3.25 ms vs 6.04 ms for the
        # one-hot kernel at bench shape (F=136, N=180K) on v5e
        return hist_pallas_radix(binned_T, grad, mask, n_bins)
    return hist_xla(binned_T, grad, mask, n_bins)


def _hist_multi_auto(binned_T, grads, weights, n_bins: int):
    # same B=256-only Mosaic gate as _hist_auto (the multi kernel is the
    # same hazard class; RF at B=256 is the proven on-chip shape)
    if n_bins == 256:
        return hist_multi_pallas(binned_T, grads, weights, n_bins)
    return hist_multi_xla(binned_T, grads, weights, n_bins)


def histogram_fn():
    """Backend-appropriate histogram implementation."""
    if on_tpu():
        return _hist_auto
    return hist_xla


def histogram_multi_fn():
    """Backend-appropriate batched (C-bag) histogram implementation."""
    if on_tpu():
        return _hist_multi_auto
    return hist_multi_xla
