"""Pallas TPU kernel: fused best-split scan over node histograms.

Replaces the XLA cumsum→gain→argmax chain of gbdt.grow._best_split /
_best_split_forest (ref: learning/tree/FeatureHistogram.java:~300
findBestSplit) on the growth loop's critical path. The chained-round
probe (tools/exp_phase_split.py, 2026-08-20) put tree growth at
12.2 ms/round — ~1.5 ms per split iteration whose histogram pass is only
a fraction — i.e. the iteration is LAUNCH/dependency-bound across ~30
small XLA ops. This kernel collapses the ~15-op scan chain into one
launch:

    c_l = hc · T,  s_l = hs · T      (T = inclusive lower-tri ones —
                                      the lane-axis cumsum as ONE f32
                                      MXU pass instead of a log-shift
                                      chain; totals are its last column)
    gain = s_l²/c_l + s_r²/c_r  where both sides ≥ mls, else −inf
    per-row (= per child·feature) first-max gain + bin

The tiny cross-feature argmax (first max, feature-major — the
reference's tie order) stays in XLA on [Cn, F] outputs. Feature masks
(RF bagging) are applied there too, so one compiled kernel serves
masked and unmasked growth.

Numerics: counts are integers (exact in f32 dot at HIGHEST); sums
accumulate in a different order than jnp.cumsum — the same class of
reordering the histogram kernel already introduces (ops/histogram.py
numerics note); split argmax is robust to it and CPU paths keep the
exact XLA reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ranklib_tpu.utils.backend import on_tpu


def _scan_kernel(hs_ref, hc_ref, out_ref, *, mls: float, n_bins: int):
    """hs/hc: [Rp, B] f32 (row = child·feature, lane = bin); out: [Rp, 128]
    f32 — col 0 best gain (−inf when nothing valid), col 1 best bin
    (first max)."""
    B = n_bins
    hs = hs_ref[:]
    hc = hc_ref[:]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    tri = (iota_r <= iota_c).astype(jnp.float32)          # inclusive cumsum
    c_l = jax.lax.dot_general(
        hc, tri, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    s_l = jax.lax.dot_general(
        hs, tri, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    c_tot = c_l[:, B - 1:B]
    s_tot = s_l[:, B - 1:B]
    c_r = c_tot - c_l
    s_r = s_tot - s_l
    ok = (c_l >= mls) & (c_r >= mls)
    gain = jnp.where(
        ok,
        s_l * s_l / jnp.maximum(c_l, 1.0) + s_r * s_r / jnp.maximum(c_r, 1.0),
        -jnp.inf)
    g_best = jnp.max(gain, axis=1, keepdims=True)          # [Rp, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, gain.shape, 1)
    b_best = jnp.min(jnp.where(gain == g_best, lane, B), axis=1,
                     keepdims=True)                        # first max
    row = jnp.concatenate(
        [g_best, b_best.astype(jnp.float32),
         jnp.zeros((gain.shape[0], 126), jnp.float32)], axis=1)
    out_ref[:] = row


_TR = 512                     # rows per block: bounds VMEM to ~4 MB of
                              # intermediates regardless of F (rows are
                              # independent; wide -sparse feature spaces
                              # reach tens of thousands of rows)


@functools.partial(jax.jit, static_argnames=("mls",))
def _scan_rows_pallas(hs, hc, mls: float):
    """[R, B] channel planes → (gain [R], bin [R])."""
    R, B = hs.shape
    TR = min(_TR, ((R + 7) // 8) * 8)
    Rp = ((R + TR - 1) // TR) * TR
    if Rp > R:
        # pad rows are all-zero: no valid candidate, gain −inf, sliced off
        hs = jnp.pad(hs, ((0, Rp - R), (0, 0)))
        hc = jnp.pad(hc, ((0, Rp - R), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_scan_kernel, mls=float(mls), n_bins=B),
        grid=(Rp // TR,),
        in_specs=[pl.BlockSpec((TR, B), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TR, B), lambda r: (r, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TR, 128), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * Rp * B * B, transcendentals=0,
            bytes_accessed=2 * Rp * B * 4 + Rp * 128 * 4),
    )(hs, hc)
    return out[:R, 0], out[:R, 1].astype(jnp.int32)


def best_splits_xla(hist, mls: float, fmask=None):
    """Reference path (runs everywhere): hist [Cn, F, B, 2] →
    (gain [Cn], feature [Cn], bin [Cn], ok [Cn]). Totals derive from each
    row's own bin sum (every feature bins every doc exactly once)."""
    # -mls 0 must still reject EMPTY sides: the reference's 0/0 division
    # yields NaN and such candidates never win, while a 0-count side here
    # would score s²/max(c,1) = the parent term and could tie-win the
    # first-max scan (review finding) — floor the support test above 0
    mls = max(float(mls), 1e-9)
    c_l = jnp.cumsum(hist[..., 1], axis=2)
    s_l = jnp.cumsum(hist[..., 0], axis=2)
    c_r = c_l[..., -1:] - c_l
    s_r = s_l[..., -1:] - s_l
    ok = (c_l >= mls) & (c_r >= mls)
    if fmask is not None:
        ok = ok & fmask[:, :, None]
    gain = jnp.where(
        ok,
        s_l * s_l / jnp.maximum(c_l, 1.0) + s_r * s_r / jnp.maximum(c_r, 1.0),
        -jnp.inf)
    Cn, F, B = gain.shape
    flat = gain.reshape(Cn, F * B)
    idx = jnp.argmax(flat, axis=1)
    g = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
    return (g, (idx // B).astype(jnp.int32), (idx % B).astype(jnp.int32),
            jnp.isfinite(g))


def best_splits(hist, mls: float, fmask=None):
    """Backend-routed best-split scan; hist [Cn, F, B, 2]."""
    mls = max(float(mls), 1e-9)    # empty sides never win (see _xla note)
    Cn, F, B, _ = hist.shape
    # B == 256 is the ONE width proven to compile on the remote Mosaic
    # compiler (CLAUDE.md hazard: lane-aligned B=128 and small/odd widths
    # HANG it); every other bin count keeps the exact XLA scan, which is
    # cheap at those sizes anyway
    if not on_tpu() or B != 256:
        return best_splits_xla(hist, mls, fmask)
    hs = hist[..., 0].reshape(Cn * F, B)
    hc = hist[..., 1].reshape(Cn * F, B)
    g_row, b_row = _scan_rows_pallas(hs, hc, float(mls))
    g = g_row.reshape(Cn, F)
    b = b_row.reshape(Cn, F)
    if fmask is not None:
        g = jnp.where(fmask, g, -jnp.inf)
    # first max feature-major — combined with the kernel's first-max bin
    # this equals the flat (f, b) argmax tie order
    f_best = jnp.argmax(g, axis=1).astype(jnp.int32)
    g_best = jnp.take_along_axis(g, f_best[:, None], axis=1)[:, 0]
    b_best = jnp.take_along_axis(b, f_best[:, None], axis=1)[:, 0]
    return g_best, f_best, b_best, jnp.isfinite(g_best)
