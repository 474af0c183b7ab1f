"""Pallas TPU kernel: fused forest-eval epilogue (serving hot path).

Replaces the scan-of-XLA-matmuls epilogue of gbdt.ensemble._mm_eval
(ref: learning/tree/Ensemble.java:~20 eval = Σ w·tree(x); the reference
walks pointers per doc — here scoring is one predicate pass plus this
kernel). The XLA path materializes, per tree chunk, a [N, TC·L] `hits`
matrix in HBM plus its leaf-indicator and output partials — ~3× the
predicate matrix's traffic and 63 kernel launches at the default chunk
size (measured 110-115 ms at 262K docs × 1000 trees on v5e, and a
tree-chunk sweep showed the XLA formulation is at its floor:
tools/exp_serving_tc.py). This kernel keeps the whole epilogue —

    hits  = predᵀ ∘ (P−Q)   (MXU, contracting the node dim)
    hits += colsum(Q)
    ind   = (hits == path_len)
    score += ind · outw      (VPU f32 multiply-reduce)

— in VMEM per (doc-tile, tree-chunk) block; the only HBM traffic is one
bf16 read of the predicate matrix and the [N] score vector, which stays
block-resident across the chunk sweep (grid is (doc_tiles, chunks) with
chunks minor — the same revisit pattern as ops.histogram).

Numerics: pred ∈ {0,1} and (P−Q) ∈ {−1,0,1} with path-count sums ≤ the
node count per chunk — exact in bf16 with f32 accumulation. The leaf
indicator and the output fold run on the VPU entirely in f32, so leaf
outputs are never rounded through a bf16 matmul (the XLA path needed
Precision.HIGHEST for that last matmul).

The leaf dim per chunk (TC·L) is padded to a lane multiple of 128 here;
padded columns carry path_len = −1, which no non-negative hit count
matches. Only B=256-style shape hazards apply (Mosaic has hung on
unusual widths before — see CLAUDE.md); this kernel uses 128-multiple
lanes and 16-multiple sublanes throughout.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# docs per tile (lane multiples). ~22 ms of the 52.9 ms serving time was
# per-block fixed cost at TN=2048 (5120 grid blocks); larger tiles halve
# the block count as long as the feature planes still fit VMEM
# (tools/exp_serving_tn.py). Overridable for probes.
_TN = int(os.environ.get("RANKLIB_TPU_SERVE_TN", "2048"))


def _forest_full3_kernel(xt3_ref, s3_ref, thr_ref, pmq_ref, aux_ref,
                         out_ref):
    """3-plane exact selection variant (the default on hardware).

    xt3: [3·Fp, TN] bf16 — the f32 feature tile split exactly into three
    bf16 planes (hi = bf16(x), mid = bf16(x − hi), lo = x − hi − mid; the
    last residual has ≤ 8 significant bits so it IS a bf16 — the split is
    an exact real-number identity for normal f32 inputs). s3: [1, TCM,
    3·Fp] bf16 one-hot selection tiled across the three plane groups, so

        vals = s3 · xt3   (ONE default-precision bf16 matmul, f32 accum)
             = hi[fid] + mid[fid] + lo[fid]  =  x[fid]   exactly

    — each sel row has exactly 3 nonzero products, every partial sum is
    representable, so the f32 accumulation is exact in any order. This
    replaces the f32 HIGHEST selection dot (6 bf16 passes) with 3 passes'
    worth of flops in a single MXU call: with the TC=25 chunking, 82 →
    52.9 ms at 262K docs × 1000 trees (tools/exp_serving_3plane.py,
    exp_serving_chunk_sweep.py; per-doc parity ≤ 4.3e-6 vs _mm_eval).
    Sub-bf16-subnormal feature values (<2^−133) are the only inexact
    corner; LETOR features are nowhere near it.

    Measured breakdown at that shape (2026-08-19): the 3 selection passes
    are ~21 ms (7.1 ms/pass — a 1-pass inexact variant runs 40.1 ms
    total), the path matmul ~10 ms, and ~22 ms is per-block fixed cost
    (5120 grid blocks: DMA waits, pred conversion, VPU epilogue). The
    formulation's floor is therefore COMPUTE/overhead-bound at ~40 ms;
    the ~12 ms figure in older notes was the XLA path's HBM-traffic
    floor, unreachable here without giving up exact f32 compares.
    """
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    vals = jax.lax.dot_general(
        s3_ref[0], xt3_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [TCM, TN] exact f32
    pred = (vals <= thr_ref[0][:, 0:1]).astype(jnp.bfloat16)
    hits = jax.lax.dot_general(
        pred, pmq_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [TN, TCLp]
    hits += aux_ref[0, 0, :][None, :]
    ind = (hits == aux_ref[0, 1, :][None, :]).astype(jnp.float32)
    partial = jnp.sum(ind * aux_ref[0, 2, :][None, :], axis=1)  # [TN]
    out_ref[:] += partial[None, :]


def _forest_full_kernel(xt_ref, s_ref, thr_ref, pmq_ref, aux_ref, out_ref,
                        *, sel_precision=None):
    """Fully-fused forest eval: predicates never leave VMEM.

    xt: [Fp, TN] f32 (features sublane-major, resident across the chunk
    sweep); s: [1, TCM, Fp] f32 one-hot node→feature selection;
    thr: [1, TCM, 128] f32 (thresholds lane-replicated);
    pmq: [1, TCM, TCLp] bf16; aux: [1, 8, TCLp] f32 (row 0 colsum(Q),
    row 1 path_len, row 2 outw); out: [8, TN] f32.

    The selection dot runs at HIGHEST precision: its rows are one-hot,
    so each output is a single f32 feature value reconstructed exactly
    by the multi-pass decomposition (checksum-verified against the
    gather path). The threshold compare happens HERE, in f32, against
    the exact training threshold — the reason serving needs no bf16
    exactness caveats anywhere.
    """
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    vals = jax.lax.dot_general(
        s_ref[0], xt_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=(jax.lax.Precision.HIGHEST if sel_precision is None
                   else sel_precision),
        preferred_element_type=jnp.float32)            # [TCM, TN]
    pred = (vals <= thr_ref[0][:, 0:1]).astype(jnp.bfloat16)
    hits = jax.lax.dot_general(
        pred, pmq_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [TN, TCLp]
    hits += aux_ref[0, 0, :][None, :]
    ind = (hits == aux_ref[0, 1, :][None, :]).astype(jnp.float32)
    partial = jnp.sum(ind * aux_ref[0, 2, :][None, :], axis=1)  # [TN]
    out_ref[:] += partial[None, :]


@functools.partial(jax.jit, static_argnames=("sel_precision",))
def forest_eval_pallas_full(X, fid_full, thr_full, PmQc, csQc, plenc,
                            outwc, sel_precision=None):
    """X: [N, F] f32; remaining args in the gbdt.ensemble._pack_matmul
    layout (fid_full/thr_full [nch·TCM], PmQc [nch, TCM, TCL],
    csQc/plenc/outwc [nch, TCL]). Returns scores [N] f32.

    Default path: the 3-plane exact bf16 selection (_forest_full3_kernel).
    ``sel_precision``: switches to the f32 selection-dot kernel with that
    precision — HIGHEST is the exact reference variant, anything below
    rounds feature values and can misroute docs at split boundaries
    (timing probes only)."""
    N, F = X.shape
    nch, TCM, TCL = PmQc.shape
    TCLp = ((TCL + 127) // 128) * 128
    Fp = ((F + 127) // 128) * 128
    Np = ((N + _TN - 1) // _TN) * _TN
    # ±inf features break the 3-plane split (hi − hi = NaN → routed
    # right, while the f32 compare routes −inf LEFT — review finding),
    # and a NaN feature would poison EVERY node of its doc through the
    # one-hot selection dot (0·NaN = NaN): the per-node semantics
    # `NaN <= t == False` ⟺ "larger than every threshold", so NaN maps
    # to +3e38 — inside bf16 range, above any finite f32 threshold scale
    XT = X.T
    XT = jnp.where(jnp.isnan(XT), 3.0e38, jnp.clip(XT, -3.0e38, 3.0e38))
    if Np > N or Fp > F:
        XT = jnp.pad(XT, ((0, Fp - F), (0, Np - N)))

    # one-hot selection blocks + lane-replicated thresholds
    sel = jax.nn.one_hot(fid_full.reshape(nch, TCM), Fp, dtype=jnp.float32)
    thr = jnp.broadcast_to(
        thr_full.reshape(nch, TCM)[:, :, None], (nch, TCM, 128))
    three_plane = sel_precision is None

    pmq = PmQc.astype(jnp.bfloat16)
    aux = jnp.stack([csQc, plenc, outwc], axis=1)       # [nch, 3, TCL]
    aux = jnp.pad(aux, ((0, 0), (0, 5), (0, 0)))        # [nch, 8, TCL]
    if TCLp > TCL:
        pmq = jnp.pad(pmq, ((0, 0), (0, 0), (0, TCLp - TCL)))
        aux = jnp.pad(aux, ((0, 0), (0, 0), (0, TCLp - TCL)))
        aux = aux.at[:, 1, TCL:].set(-1.0)

    if three_plane:
        # Exact 3-way bf16 split of the f32 feature tile (see kernel doc).
        # The split MUST truncate via mantissa bitmasking, not round via
        # convert: XLA-TPU's excess-precision simplification cancels the
        # f32→bf16→f32 round-trip in `x − f32(bf16(x))`, folding the
        # residual planes to zero (measured: r1 ≡ 0 on hardware, exact in
        # interpret mode). A masked value is a valid bf16 value, every
        # residual subtraction is exact, and the final residual has ≤ 8
        # significant bits, so hi+mid+lo == x exactly.
        def _trunc(v):
            return jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(v, jnp.uint32)
                & jnp.uint32(0xFFFF0000), jnp.float32)

        hi = _trunc(XT)
        r1 = XT - hi
        mid = _trunc(r1)
        lo = r1 - mid
        XT_in = jnp.concatenate(
            [hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
             lo.astype(jnp.bfloat16)], axis=0)              # [3Fp, Np]
        sel_in = jnp.tile(sel.astype(jnp.bfloat16), (1, 1, 3))
        kernel = _forest_full3_kernel
        Fk = 3 * Fp
        xt_bytes, sel_bytes = 2, 2
    else:
        XT_in, sel_in, Fk = XT, sel, Fp
        kernel = functools.partial(_forest_full_kernel,
                                   sel_precision=sel_precision)
        xt_bytes, sel_bytes = 4, 4

    grid = (Np // _TN, nch)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Fk, _TN), lambda d, c: (0, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TCM, Fk), lambda d, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TCM, 128), lambda d, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TCM, TCLp), lambda d, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TCLp), lambda d, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, _TN), lambda d, c: (0, d),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Np), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * nch * TCM * (Fk + TCLp), transcendentals=0,
            bytes_accessed=Fk * Np * xt_bytes + 8 * Np * 4
            + nch * TCM * (Fk * sel_bytes + TCLp * 2)),
    )(XT_in, sel_in, thr, pmq, aux)
    return out[0, :N]


def _bins_selection_epilogue(bins, s_ref, nb_ref, pmq_ref, aux_ref,
                             out_ref):
    """The parity-DEFINING selection + leaf fold shared by the fused,
    split, and host-binned bin-space kernels (one copy — review finding,
    round 5: three verbatim clones of this block had to stay
    bit-identical by hand): one bf16 selection dot (exact — bin ids
    ≤ 256 are bf16 integers, each sel row one-hot), the node compare,
    the P−Q path dot, and the leaf fold (csQ folded into the
    path-length row host-side: hits_raw + csQ == plen ⟺ hits_raw ==
    plen − csQ; the indicator·outw product collapses into one
    select)."""
    vals = jax.lax.dot_general(
        s_ref[0], bins,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [TCM, TN] exact
    pred = (vals <= nb_ref[0][:, 0:1]).astype(jnp.bfloat16)
    hits = jax.lax.dot_general(
        pred, pmq_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [TN, TCLp]
    contrib = jnp.where(hits == aux_ref[0, 0, :][None, :],
                        aux_ref[0, 1, :][None, :], 0.0)
    out_ref[:] += jnp.sum(contrib, axis=1)[None, :]


def _forest_bins_kernel(xt_ref, grid_ref, s_ref, nb_ref, pmq_ref, aux_ref,
                        out_ref, bins_ref, *, n_grid: int, n_rows: int):
    """Bin-space exact variant: ONE default-precision bf16 selection pass.

    The model's split thresholds per feature form a strictly increasing
    grid (built from the ensemble itself — _pack_matmul_bins); a doc's
    BIN b(x) = #{grid values < x} satisfies ``x <= t  ⟺  b(x) <= idx(t)``
    exactly for every grid value t. Bin ids are small integers (≤ 256 for
    -tc 256 models), exactly representable in bf16, and each selection
    row is one-hot — so ``sel ⋅ bins`` is ONE bf16 MXU pass with exact
    f32 results, replacing the 3-plane split (3 passes ~21 ms of the
    52.9 ms total at 262K docs × 1000 trees).

    Binning runs ON-KERNEL as a c==0 prologue into a VMEM scratch that
    persists across the chunk sweep (grid iterates chunks minor): an
    unrolled compare-accumulate over the ≤256 grid columns — pure VPU
    work on the resident [Fp, TN] tile, measured ~3 ms total. NaN
    features bin to n_grid (> every node bin → routed right, matching
    the dense `NaN <= t == False`)."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        # compare only the REAL feature rows (n_rows = F padded to 16 —
        # the prologue is the kernel's VPU bottleneck and a 256-row pad
        # nearly doubles it); the matmul contraction stays the full
        # 128-multiple Fp (a 144-lane contraction measured 3x slower).
        # Scratch pad rows are zeroed once: sel pad columns are zero, but
        # 0 * uninitialized-NaN would poison the dot.
        x = xt_ref[0:n_rows]
        acc = jnp.zeros(x.shape, jnp.float32)
        for b in range(n_grid):
            acc += (grid_ref[0:n_rows, b][:, None] < x).astype(jnp.float32)
        acc = jnp.where(jnp.isnan(x), jnp.float32(n_grid), acc)
        bins_ref[0:n_rows] = acc.astype(jnp.bfloat16)
        if n_rows < bins_ref.shape[0]:
            bins_ref[n_rows:] = jnp.zeros(
                (bins_ref.shape[0] - n_rows, bins_ref.shape[1]),
                jnp.bfloat16)
        out_ref[:] = jnp.zeros_like(out_ref)

    _bins_selection_epilogue(bins_ref[:], s_ref, nb_ref,
                             pmq_ref, aux_ref, out_ref)


@functools.partial(jax.jit, static_argnames=("n_grid",))
def forest_eval_pallas_bins(X, grid, fid_full, nodebin_full, PmQc, csQc,
                            plenc, outwc, n_grid=None):
    """Bin-space forest eval. ``grid``: [F, Bm] f32 per-feature model
    threshold grids (+inf padded); ``nodebin_full``: [nch·TCM] f32 node
    bin indices; other args in the _pack_matmul layout; ``n_grid``: true
    max grid length (the VPU compare loop runs only this far — the lane
    pad to Bm is all +inf and contributes nothing). Returns [N] f32.

    The feature (sublane/contraction) dim pads to a multiple of 16, not
    128 — the binning compare loop is the kernel's VPU bottleneck and
    scales with the padded row count (136→144 instead of 136→256 nearly
    halves it). The 16-multiple keeps the bf16 scratch sublane-tiled and
    the selection dot's contraction dim safely aligned (Mosaic computed
    silently wrong bf16 dots at sublane 225 — see _pack_matmul note;
    checksum parity vs _mm_eval is pinned in tests and re-verified by
    the hardware probes)."""
    N, F = X.shape
    nch, TCM, TCL = PmQc.shape
    Bm = grid.shape[1]
    if n_grid is None:
        n_grid = Bm
    TCLp = ((TCL + 127) // 128) * 128
    Fp = ((F + 127) // 128) * 128          # matmul contraction dim
    n_rows = min(((F + 15) // 16) * 16, Fp)  # compare-loop rows
    Np = ((N + _TN - 1) // _TN) * _TN
    XT = X.T
    if Np > N or Fp > F:
        XT = jnp.pad(XT, ((0, Fp - F), (0, Np - N)))
    gridp = grid
    if Fp > F:
        # pad features: all-+inf grid rows bin everything to 0 (unused)
        gridp = jnp.pad(grid, ((0, Fp - F), (0, 0)),
                        constant_values=jnp.inf)

    sel, nb, pmq, aux, TCLp = _selection_operands(
        fid_full, nodebin_full, PmQc, csQc, plenc, outwc, Fp)

    grid_dims = (Np // _TN, nch)
    out = pl.pallas_call(
        functools.partial(_forest_bins_kernel, n_grid=int(n_grid),
                          n_rows=int(n_rows)),
        grid=grid_dims,
        in_specs=[
            pl.BlockSpec((Fp, _TN), lambda d, c: (0, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Fp, Bm), lambda d, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TCM, Fp), lambda d, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TCM, 128), lambda d, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TCM, TCLp), lambda d, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TCLp), lambda d, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, _TN), lambda d, c: (0, d),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Fp, _TN), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * nch * TCM * (Fp + TCLp) + Np * Fp * Bm,
            transcendentals=0,
            bytes_accessed=Fp * Np * 4 + 8 * Np * 4
            + nch * TCM * (Fp * 2 + TCLp * 2)),
    )(XT, gridp, sel, nb, pmq, aux)
    return out[0, :N]


def _bins_only_kernel(xt_ref, grid_ref, bins_ref, *, n_grid: int,
                      n_rows: int):
    """Standalone binning pass: [Fp, TNB] f32 features → bf16 bin ids.
    Same compare-accumulate as _forest_bins_kernel's c==0 prologue; split
    out so the SELECTION kernel never holds the f32 xt in VMEM (its
    double-buffered residency was what kept the fused kernel at
    TN=2048)."""
    x = xt_ref[0:n_rows]
    acc = jnp.zeros(x.shape, jnp.float32)
    for b in range(n_grid):
        acc += (grid_ref[0:n_rows, b][:, None] < x).astype(jnp.float32)
    acc = jnp.where(jnp.isnan(x), jnp.float32(n_grid), acc)
    bins_ref[0:n_rows] = acc.astype(jnp.bfloat16)
    if n_rows < bins_ref.shape[0]:
        bins_ref[n_rows:] = jnp.zeros(
            (bins_ref.shape[0] - n_rows, bins_ref.shape[1]), jnp.bfloat16)


def _selection_operands(fid_full, nodebin_full, PmQc, csQc, plenc, outwc,
                        Fp: int):
    """Shared device-operand packing of the bin-space selection sweep
    (fused / split / from-host-bins wrappers): the per-chunk one-hot
    selection matrix, broadcast node-bin thresholds, bf16 P−Q planes and
    the 2-row aux block (plen−csQ fold + leaf outputs), all lane-padded.
    Padded leaf columns carry plen_adj = −1, which raw hits ≥ 0 never
    match."""
    nch, TCM, TCL = PmQc.shape
    TCLp = ((TCL + 127) // 128) * 128
    sel = jax.nn.one_hot(fid_full.reshape(nch, TCM), Fp,
                         dtype=jnp.bfloat16)
    nb = jnp.broadcast_to(
        nodebin_full.reshape(nch, TCM)[:, :, None], (nch, TCM, 128))
    pmq = PmQc.astype(jnp.bfloat16)
    # row 0: plen − csQ (csQ folded host-side); row 1: outw
    aux = jnp.stack([plenc - csQc, outwc], axis=1)      # [nch, 2, TCL]
    aux = jnp.pad(aux, ((0, 0), (0, 6), (0, 0)))        # [nch, 8, TCL]
    if TCLp > TCL:
        pmq = jnp.pad(pmq, ((0, 0), (0, 0), (0, TCLp - TCL)))
        aux = jnp.pad(aux, ((0, 0), (0, 0), (0, TCLp - TCL)))
        aux = aux.at[:, 0, TCL:].set(-1.0)
    return sel, nb, pmq, aux, TCLp


def _forest_bins_split_kernel(bins_ref, s_ref, nb_ref, pmq_ref, aux_ref,
                              out_ref):
    """Selection half of the split bin-space eval: identical math to
    _forest_bins_kernel minus the binning prologue (bins arrive as a
    bf16 input block), so the doc tile can grow past the fused kernel's
    VMEM ceiling."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    _bins_selection_epilogue(bins_ref[:], s_ref, nb_ref,
                             pmq_ref, aux_ref, out_ref)


_TN_SPLIT = int(os.environ.get("RANKLIB_TPU_SERVE_TN_SPLIT", "4096"))


@functools.partial(jax.jit, static_argnames=("n_grid",))
def forest_eval_pallas_bins_split(X, grid, fid_full, nodebin_full, PmQc,
                                  csQc, plenc, outwc, n_grid=None):
    """Two-kernel bin-space forest eval: a binning pass materializes the
    bf16 bin matrix to HBM (≈2 bytes/feature/doc each way — ~0.3 ms of
    bandwidth at 262K docs × 256 features), then the selection sweep
    runs WITHOUT the f32 xt resident, which lets the doc tile double to
    TN=4096 (the fused kernel measured a 416 KB VMEM overrun there).
    Bit-identical results to forest_eval_pallas_bins (same compares,
    same dots)."""
    N, F = X.shape
    nch, TCM, TCL = PmQc.shape
    Bm = grid.shape[1]
    if n_grid is None:
        n_grid = Bm
    TCLp = ((TCL + 127) // 128) * 128
    Fp = ((F + 127) // 128) * 128
    n_rows = min(((F + 15) // 16) * 16, Fp)
    TN = _TN_SPLIT
    Np = ((N + TN - 1) // TN) * TN
    XT = X.T
    if Np > N or Fp > F:
        XT = jnp.pad(XT, ((0, Fp - F), (0, Np - N)))
    gridp = grid
    if Fp > F:
        gridp = jnp.pad(grid, ((0, Fp - F), (0, 0)),
                        constant_values=jnp.inf)

    TNB = min(_TN, TN)                     # binning-pass doc tile
    if TN % TNB:
        # Np is a multiple of TN only — a non-divisor TNB would floor
        # away trailing tiles and leave their bins unwritten
        TNB = TN
    bins = pl.pallas_call(
        functools.partial(_bins_only_kernel, n_grid=int(n_grid),
                          n_rows=int(n_rows)),
        grid=(Np // TNB,),
        in_specs=[
            pl.BlockSpec((Fp, TNB), lambda d: (0, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Fp, Bm), lambda d: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Fp, TNB), lambda d: (0, d),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Fp, Np), jnp.bfloat16),
    )(XT, gridp)

    sel, nb, pmq, aux, TCLp = _selection_operands(
        fid_full, nodebin_full, PmQc, csQc, plenc, outwc, Fp)

    out = pl.pallas_call(
        _forest_bins_split_kernel,
        grid=(Np // TN, nch),
        in_specs=[
            pl.BlockSpec((Fp, TN), lambda d, c: (0, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TCM, Fp), lambda d, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TCM, 128), lambda d, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TCM, TCLp), lambda d, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TCLp), lambda d, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TN), lambda d, c: (0, d),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Np), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * nch * TCM * (Fp + TCLp),
            transcendentals=0,
            bytes_accessed=Fp * Np * 2 + 8 * Np * 4
            + nch * TCM * (Fp * 2 + TCLp * 2)),
    )(bins, sel, nb, pmq, aux)
    return out[0, :N]


def _forest_frombins_kernel(bini_ref, s_ref, nb_ref, pmq_ref, aux_ref,
                            out_ref):
    """Selection sweep over HOST-binned ids: the _forest_bins_split_kernel
    math, with the bf16 bin block produced by an in-kernel upcast of a
    uint8/int16 input (sub-32-bit VMEM loads and via-i32 upcasts compile
    through the relay; only sub-32-bit COMPARES crash — CLAUDE.md hazard
    taxonomy). Bin ids ≤ 256 are exact in bf16, so scores are
    bit-identical to the fused bins kernel's."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    bins = (bini_ref[:].astype(jnp.int32).astype(jnp.float32)
            .astype(jnp.bfloat16))
    _bins_selection_epilogue(bins, s_ref, nb_ref,
                             pmq_ref, aux_ref, out_ref)


@functools.partial(jax.jit, static_argnames=("n_grid",))
def forest_eval_pallas_frombins(binsT, fid_full, nodebin_full, PmQc, csQc,
                                plenc, outwc, n_grid: int = 256):
    """Bin-space forest eval from PRE-BINNED docs. ``binsT``: [F, N]
    integer bin ids (uint8/int16/int32), binned on the HOST against the
    model's own per-feature threshold grid with the kernel prologue's
    exact rule ``bin = #{grid < x}`` and NaN → n_grid
    (ensemble._eval_matrix_hostbin does this via the native binner).
    ``n_grid``: the max bin id the caller can produce — asserted ≤ 256
    because the selection pass casts ids to bf16, which is integer-exact
    only that far (the fused kernels get the same guarantee from the
    _use_bins_kernel Bm_real gate; this entry point has no router above
    it, so it checks its own precondition).

    Purpose: eval_matrix always starts from host features, and through
    the device tunnel the f32 feature upload dominates end-to-end scoring
    (4 bytes/feature/doc ≈ 2.2 GB at 4M docs × 136 feats, vs a ~40 ms
    kernel). Host binning drops the transfer to 1–2 bytes/feature/doc;
    the selection math is identical to forest_eval_pallas_bins, so the
    scores are bit-identical. VMEM per block is strictly SMALLER than
    the fused kernel's at the same doc tile (the f32 xt plane and the
    grid never load), so the fused kernel's routing gate is sufficient."""
    assert n_grid <= 256, "bin ids past 256 are not bf16-exact"
    F, N = binsT.shape
    Fp = ((F + 127) // 128) * 128          # matmul contraction dim
    Np = ((N + _TN - 1) // _TN) * _TN
    if Np > N or Fp > F:
        # pad bin 0: pad FEATURE rows are never one-hot-selected by real
        # rows (dead pad rows select feature 0 but their P−Q rows are
        # zero); pad DOC columns produce garbage sliced off below
        binsT = jnp.pad(binsT, ((0, Fp - F), (0, Np - N)))
    sel, nb, pmq, aux, TCLp = _selection_operands(
        fid_full, nodebin_full, PmQc, csQc, plenc, outwc, Fp)
    nch, TCM, _ = PmQc.shape

    out = pl.pallas_call(
        _forest_frombins_kernel,
        grid=(Np // _TN, nch),
        in_specs=[
            pl.BlockSpec((Fp, _TN), lambda d, c: (0, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TCM, Fp), lambda d, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TCM, 128), lambda d, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TCM, TCLp), lambda d, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TCLp), lambda d, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, _TN), lambda d, c: (0, d),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Np), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * nch * TCM * (Fp + TCLp),
            transcendentals=0,
            bytes_accessed=Fp * Np * binsT.dtype.itemsize + 8 * Np * 4
            + nch * TCM * (Fp * 2 + TCLp * 2)),
    )(binsT, sel, nb, pmq, aux)
    return out[0, :N]


def _forest_kernel(pred_ref, pmq_ref, aux_ref, out_ref):
    """pred: [TCM, TN] bf16; pmq: [1, TCM, TCLp] bf16;
    aux: [1, 8, TCLp] f32 (row 0 colsum(Q), row 1 path_len, row 2 outw);
    out: [8, TN] f32 (all rows identical — sublane-aligned accumulator).
    """
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    hits = jax.lax.dot_general(
        pred_ref[:], pmq_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [TN, TCLp]
    hits += aux_ref[0, 0, :][None, :]
    ind = (hits == aux_ref[0, 1, :][None, :]).astype(jnp.float32)
    partial = jnp.sum(ind * aux_ref[0, 2, :][None, :], axis=1)  # [TN]
    out_ref[:] += partial[None, :]


@jax.jit
def forest_eval_pallas(predT, PmQc, csQc, plenc, outwc):
    """predT: [nch·TCM, N] bf16 (chunk-major rows, gbdt.ensemble layout);
    PmQc: [nch, TCM, TCL]; csQc/plenc/outwc: [nch, TCL] f32 (plen pads
    are already −1). Returns scores [N] f32."""
    nchTCM, N = predT.shape
    nch, TCM, TCL = PmQc.shape
    TCLp = ((TCL + 127) // 128) * 128
    Np = ((N + _TN - 1) // _TN) * _TN
    if Np > N:
        predT = jnp.pad(predT, ((0, 0), (0, Np - N)))
    pmq = PmQc.astype(jnp.bfloat16)
    aux = jnp.stack([csQc, plenc, outwc], axis=1)       # [nch, 3, TCL]
    aux = jnp.pad(aux, ((0, 0), (0, 5), (0, 0)))        # [nch, 8, TCL]
    if TCLp > TCL:
        pmq = jnp.pad(pmq, ((0, 0), (0, 0), (0, TCLp - TCL)))
        aux = jnp.pad(aux, ((0, 0), (0, 0), (0, TCLp - TCL)))
        # padded leaf columns: hits = 0 + csq(0) = 0; make plen −1 so
        # they never match (real plen pads are −1 already upstream)
        aux = aux.at[:, 1, TCL:].set(-1.0)

    grid = (Np // _TN, nch)
    out = pl.pallas_call(
        _forest_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TCM, _TN), lambda d, c: (c, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TCM, TCLp), lambda d, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TCLp), lambda d, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, _TN), lambda d, c: (0, d),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Np), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * nch * TCM * TCLp, transcendentals=0,
            bytes_accessed=nchTCM * Np * 2 + 8 * Np * 4),
    )(predT, pmq, aux)
    return out[0, :N]
