"""Flat tree ensembles: vectorized traversal + RankLib model-file format.

The reference stores trees as object graphs and serializes them as the
``<ensemble><tree id=.. weight=..><split>…`` XML-ish text
(ref: learning/tree/Ensemble.java:~100, learning/tree/Split.java
serialization). Our trees are flat slot arrays (feature/threshold/left/
right/output per node); traversal is a vectorized pointer chase — one
gather per depth level over all docs × all trees, instead of per-DataPoint
virtual calls (ref: Ensemble.eval = Σ weight·tree.eval).

Save/load parity goal (SURVEY.md §5 checkpoint row): a model we save loads
in RankLib and vice versa. Feature ids in the file are 1-indexed fids.
"""

from __future__ import annotations

import functools
import xml.etree.ElementTree as ET

import jax
import jax.numpy as jnp
import numpy as np

from ranklib_tpu.utils.errors import RankLibError


class Tree:
    """One tree in flat-slot form (host numpy). Slot 0 = root."""

    __slots__ = ("feature", "threshold", "left", "right", "is_leaf", "output")

    def __init__(self, feature, threshold, left, right, is_leaf, output):
        self.feature = np.asarray(feature, np.int32)      # 0-based column
        self.threshold = np.asarray(threshold, np.float32)
        self.left = np.asarray(left, np.int32)
        self.right = np.asarray(right, np.int32)
        self.is_leaf = np.asarray(is_leaf, bool)
        self.output = np.asarray(output, np.float32)

    @property
    def n_slots(self):
        return len(self.feature)

    def depth(self) -> int:
        best = 0
        stack = [(0, 0)]                  # iterative: chain trees can
        while stack:                      # exceed the recursion limit
            node, d = stack.pop()
            if self.is_leaf[node]:
                best = max(best, d)
            else:
                stack.append((int(self.left[node]), d + 1))
                stack.append((int(self.right[node]), d + 1))
        return best


class TreeEnsemble:
    """List of (Tree, weight); weight = learning rate for boosted models
    (ref: Ensemble.add(tree, learningRate))."""

    def __init__(self):
        self.trees: list[Tree] = []
        self.weights: list[float] = []
        self._packed = None
        self._mm = None

    def add(self, tree: Tree, weight: float):
        self.trees.append(tree)
        self.weights.append(float(weight))
        self._packed = None
        self._mm = None
        self._mmb = None
        self._bins_meta = None
        self._thr_band = None

    def truncate(self, n: int):
        """Keep the first n trees (validation-best rollback,
        ref: LambdaMART learn() post-loop truncation)."""
        self.trees = self.trees[:n]
        self.weights = self.weights[:n]
        self._packed = None
        self._mm = None
        self._mmb = None
        self._bins_meta = None
        self._thr_band = None

    def __len__(self):
        return len(self.trees)

    def to_bin_space(self, thresholds: np.ndarray) -> "TreeEnsemble":
        """Rewrite every split threshold t on feature f into its bin id
        ``b = searchsorted(thresholds[f], t, 'left')`` so the ensemble
        evaluates EXACTLY on a bin matrix: ``value <= t ⟺ bin <= b``
        whenever t is a grid point — true by construction for ensembles
        trained with this grid (the streaming ``-sparse`` path, which
        keeps no raw feature values to evaluate on). Raises when a split
        threshold is not on the grid (e.g. a model loaded from elsewhere)
        — that model needs the dense pipeline."""
        out = TreeEnsemble()
        B = thresholds.shape[1]
        for tree, w in zip(self.trees, self.weights):
            split = ~tree.is_leaf
            rows = thresholds[tree.feature]                  # [S, B]
            b = (rows < tree.threshold[:, None]).sum(axis=1)  # lower_bound
            on_grid = np.take_along_axis(
                rows, np.minimum(b, B - 1)[:, None], axis=1
            )[:, 0] == tree.threshold
            if not np.all(on_grid[split] & (b[split] < B)):
                raise RankLibError(
                    "ensemble has split thresholds off the binning grid; "
                    "bin-space evaluation needs a model trained with this "
                    "grid (use the dense pipeline instead)")
            thr = np.where(split, b.astype(np.float32), 0.0)
            out.add(Tree(tree.feature, thr, tree.left, tree.right,
                         tree.is_leaf, tree.output), w)
        return out

    # ---- vectorized eval ---------------------------------------------------
    #
    # Matmul-path scoring (the serving hot path). Pointer-chasing traversal
    # is gather-bound and catastrophically slow on TPU (measured 174 s for
    # 262K docs × 1000 trees); instead:
    #
    #   vals = X[:, fid]      static column gather         [N, TC·M]  (VPU)
    #   pred = vals <= thr    (bf16 0/1 — exact)            (VPU)
    #   hits = pred @ P + (1 − pred) @ Q  path agreement   [N, TC·L]  (MXU)
    #   ind  = hits == path_len           leaf indicator   (VPU)
    #   score += ind @ outw                                (MXU)
    #
    # where P/Q encode, per leaf, which internal nodes must test true/false
    # on its root path. Trees are processed in chunks of TC so the
    # block-diagonal P/Q stay dense but small.
    #
    # Design notes (each measured on v5e at 262K docs × 1000 trees,
    # tools/exp_serving_gatherT.py, 2026-08-19 — all variants EXACT):
    #
    # * Selection is a GATHER, not a matmul: every predicate column reads
    #   exactly one feature of X, and the per-node index is static. The
    #   earlier one-hot `X @ S` needed Precision.HIGHEST for exactness
    #   (bf16 operand rounding misroutes docs at split boundaries): 202 ms.
    #   Gathering rows of X^T (sublane-dim gather = plain DMA; lane-dim
    #   gathers lower poorly) and keeping the whole pipeline transposed:
    #   149 ms.
    # * `pred` is 0/1 and path-agreement sums are small integers (≤ path
    #   depth), exact in bf16 — the only [T·M, N]-sized intermediate is
    #   stored bf16, halving its HBM traffic.
    # * p@P + (1−p)@Q ≡ p@(P−Q) + colsum(Q): ONE path matmul instead of
    #   two ((P−Q) ∈ {−1,0,1}, still exact in bf16): 115 ms.
    # 25 trees/chunk: TC·L = 250 → 256 lane pad (2% waste vs 60% at
    # TC=16) and a 5120-block grid (vs 8064): 56.8 → 52.9 ms at 262K
    # docs × 1000 trees (tools/exp_serving_chunk_sweep.py, 2026-08-19;
    # per-doc parity ≤ 4.3e-6 vs TC=16 and vs _mm_eval on hardware).
    # Re-swept for the bin-space kernel (exp_serving_bins_tc.py,
    # 2026-08-20): TC 16/25/32/50 → 47.1/44.1/49.4/48.9 ms — 25 stays.
    _TREE_CHUNK = 25

    def _pack_matmul(self, n_features: int):
        key = ("mm", n_features)
        if getattr(self, "_mm", None) is None or self._mm[0] != key:
            T = len(self.trees)
            M = max(max((~t.is_leaf).sum(), 1) for t in self.trees)
            L = max(t.is_leaf.sum() for t in self.trees)
            TC = self._TREE_CHUNK
            Tp = ((T + TC - 1) // TC) * TC
            fid = np.zeros((Tp, M), np.int32)
            thr = np.zeros((Tp, M), np.float32)
            P = np.zeros((Tp, M, L), np.float32)
            Q = np.zeros((Tp, M, L), np.float32)
            plen = np.full((Tp, L), -1.0, np.float32)   # pads never match
            outw = np.zeros((Tp, L), np.float32)
            for ti, (t, w) in enumerate(zip(self.trees, self.weights)):
                internal = np.flatnonzero(~t.is_leaf)
                slot_of = {int(n): i for i, n in enumerate(internal)}
                for i, n in enumerate(internal):
                    fid[ti, i] = t.feature[n]
                    thr[ti, i] = t.threshold[n]
                li = 0
                # DFS collecting (leaf, path) pairs
                stack = [(0, [])]
                while stack:
                    node, path = stack.pop()
                    if t.is_leaf[node]:
                        for m, left in path:
                            (P if left else Q)[ti, slot_of[m], li] = 1.0
                        plen[ti, li] = len(path)
                        outw[ti, li] = t.output[node] * w
                        li += 1
                    else:
                        stack.append((int(t.right[node]), path + [(node, False)]))
                        stack.append((int(t.left[node]), path + [(node, True)]))
            nch = Tp // TC
            # Per-chunk predicate ROW count (TC·M) padded to a multiple of
            # 16 — the bf16 sublane tile. Mosaic silently computed WRONG
            # hits from a bf16 dot whose sublane dim was 225 (TC=25, M=9):
            # checksum drift ~2.5e-5/doc on v5e, exact on CPU/interpret
            # (tools/exp_serving_chunk_sweep.py, 2026-08-19). Dead rows are
            # harmless by construction: fid 0, thr 0, zero P/Q rows.
            TCM = ((TC * M + 15) // 16) * 16
            # one selection index vector for ALL trees (X is read from HBM
            # once), plus chunked dense P/Q blocks for the path matmuls
            fid_full = np.zeros((nch * TCM,), np.int32)
            thr_full = np.zeros((nch * TCM,), np.float32)
            Pc = np.zeros((nch, TCM, TC * L), np.float32)
            Qc = np.zeros((nch, TCM, TC * L), np.float32)
            plenc = np.full((nch, TC * L), -1.0, np.float32)
            outwc = np.zeros((nch, TC * L), np.float32)
            for c in range(nch):
                for j in range(TC):
                    ti = c * TC + j
                    col = c * TCM + j * M
                    fid_full[col: col + M] = fid[ti]
                    thr_full[col: col + M] = thr[ti]
                    Pc[c, j * M:(j + 1) * M, j * L:(j + 1) * L] = P[ti]
                    Qc[c, j * M:(j + 1) * M, j * L:(j + 1) * L] = Q[ti]
                    plenc[c, j * L:(j + 1) * L] = plen[ti]
                    outwc[c, j * L:(j + 1) * L] = outw[ti]
            PmQc = Pc - Qc                      # {-1, 0, 1}
            csQc = Qc.sum(axis=1)               # [nch, TC·L]
            self._mm = (key, tuple(jnp.asarray(a) for a in
                                   (fid_full, thr_full, PmQc, csQc, plenc,
                                    outwc)))
        return self._mm[1]

    def _pack_matmul_bins(self, n_features: int):
        """Bin-space serving pack (ops.forest_eval.forest_eval_pallas_bins):
        the _pack_matmul layout plus (a) per-feature grids of the MODEL'S
        OWN split thresholds (strictly increasing, +inf lane-padded) and
        (b) each node's threshold rewritten as its index in its feature's
        grid. Self-contained — works for any loaded model, no training
        grid required (unlike to_bin_space); exact by construction since
        every node threshold IS a grid point."""
        key = ("mmb", n_features)
        if getattr(self, "_mmb", None) is None or self._mmb[0] != key:
            fid_full, thr_full, PmQc, csQc, plenc, outwc = (
                self._pack_matmul(n_features))
            fid = np.asarray(fid_full)
            thr = np.asarray(thr_full)
            _, Bm_real = self._bins_grid_meta()
            grid = self._model_grid_np(n_features)
            # node bin = #(grid values < threshold) — index of the
            # threshold itself (strictly increasing grid, exact f32 match).
            # Dead pad rows (fid 0, thr 0) get an arbitrary bin: their
            # P−Q rows are zero, the predicate never contributes.
            nodebin = (grid[np.minimum(fid, n_features - 1)]
                       < thr[:, None]).sum(axis=1).astype(np.float32)
            self._mmb = (key, (jnp.asarray(grid), fid_full,
                               jnp.asarray(nodebin), PmQc, csQc, plenc,
                               outwc), Bm_real)
        return self._mmb[1] + (self._mmb[2],)

    def _pack(self):
        if self._packed is None:
            T = len(self.trees)
            M = max(t.n_slots for t in self.trees)
            depth = max(t.depth() for t in self.trees) if T else 0
            feat = np.zeros((T, M), np.int32)
            thr = np.zeros((T, M), np.float32)
            lft = np.zeros((T, M), np.int32)
            rgt = np.zeros((T, M), np.int32)
            leaf = np.ones((T, M), bool)
            out = np.zeros((T, M), np.float32)
            for i, t in enumerate(self.trees):
                m = t.n_slots
                feat[i, :m] = t.feature
                thr[i, :m] = t.threshold
                lft[i, :m] = np.maximum(t.left, 0)
                rgt[i, :m] = np.maximum(t.right, 0)
                leaf[i, :m] = t.is_leaf
                out[i, :m] = t.output
            self._packed = (
                jnp.asarray(feat), jnp.asarray(thr), jnp.asarray(lft),
                jnp.asarray(rgt), jnp.asarray(leaf), jnp.asarray(out),
                jnp.asarray(np.asarray(self.weights, np.float32)), depth,
            )
        return self._packed

    # docs per eval launch. XLA path: bounds the [chunk, T·M] predicate
    # matrix in HBM. Kernel path: predicates never leave VMEM, so the
    # chunk only bounds the transposed f32 copy of X — much larger.
    _EVAL_CHUNK = 1 << 14
    _EVAL_CHUNK_KERNEL = 1 << 20
    # Conservative VMEM ceiling for the fused kernel (v5e has ~16 MB;
    # leave headroom for Mosaic's own scratch). Shapes past this fall
    # back to _mm_eval, which handles any shape.
    # 13 MB: the TC=25 default estimates 12.6 MB and runs clean on v5e
    # (the estimate double-buffers everything, so it overstates).
    _KERNEL_VMEM_BUDGET = 13 << 20

    def _thr_band_ok(self) -> bool:
        """True iff every INTERNAL-node threshold lies in [−3e38, 3e38) —
        the band where forest_eval_pallas_full's feature clamp preserves
        `value <= threshold` exactly (see _use_forest_kernel). Cached per
        add/truncate (same discipline as the other packs); leaf slots are
        excluded (their threshold slot is meaningless)."""
        if getattr(self, "_thr_band", None) is None:
            ok = True
            for t in self.trees:
                thr = t.threshold[~t.is_leaf]
                if thr.size and not bool(
                        np.all((thr >= -3.0e38) & (thr < 3.0e38))):
                    ok = False
                    break
            self._thr_band = ok
        return self._thr_band

    def _use_forest_kernel(self, n_features: int) -> bool:
        """Route to the fused Pallas kernel only on TPU AND when its
        per-block VMEM footprint fits. Only ~(10 leaves, 136 feats) was
        ever exercised on hardware; a wide-feature or deep-leaf model
        (e.g. -leaf 500) would blow VMEM — or worse, hang the remote
        Mosaic compiler (CLAUDE.md hazard) — so estimate first."""
        import os

        from ranklib_tpu.utils.backend import on_tpu

        if not on_tpu() or os.environ.get(
                "RANKLIB_TPU_FOREST_KERNEL", "1") == "0":
            return False
        # The kernel's ±3e38 feature clamp (NaN → +3e38) is EXACT only
        # when every split threshold lies in [−3e38, 3e38): a threshold
        # in (3e38, 3.4e38] would tie/flip against clamped features and
        # the NaN sentinel (review finding, round 5). Such models are
        # only reachable with data in that extreme band — route them to
        # the exact XLA compare path like other hostile shapes. (NaN
        # thresholds fail the comparisons → also routed off.)
        if not self._thr_band_ok():
            return False
        # mirror forest_eval_pallas_full's block shapes (TN = 2048)
        M = max(max((~t.is_leaf).sum(), 1) for t in self.trees)
        L = max(t.is_leaf.sum() for t in self.trees)
        TC = self._TREE_CHUNK
        TCM = ((TC * M + 15) // 16) * 16      # _pack_matmul's row padding
        TCLp = ((TC * L + 127) // 128) * 128
        Fp = ((n_features + 127) // 128) * 128
        from ranklib_tpu.ops.forest_eval import _TN as TN
        est = (2 * (3 * Fp * TN * 2)           # xt3 bf16 tile, double-buffered
               + 2 * (TCM * 3 * Fp * 2)        # sel3 bf16
               + 2 * (TCM * 128 * 4)           # thr
               + 2 * (TCM * TCLp * 2)          # pmq (bf16)
               + 2 * (8 * TCLp * 4)            # aux
               + 8 * TN * 4                    # out accumulator
               + TCM * TN * 4                  # vals intermediate
               + TCM * TN * 2                  # pred (bf16)
               + TN * TCLp * 4)                # hits intermediate
        return est <= self._KERNEL_VMEM_BUDGET

    def _bins_grid_meta(self):
        """(per-feature unique split-threshold sets, max count) — the
        model-grid ingredients, cached (the O(nodes) pass otherwise
        repeats per eval_matrix chunk); invalidated by add/truncate."""
        if getattr(self, "_bins_meta", None) is None:
            uniq = {}
            for t in self.trees:
                for n in np.flatnonzero(~t.is_leaf):
                    uniq.setdefault(int(t.feature[n]), set()).add(
                        np.float32(t.threshold[n]))
            Bm_real = max((len(s) for s in uniq.values()), default=1)
            self._bins_meta = (uniq, Bm_real)
        return self._bins_meta

    def _model_grid_np(self, n_features: int) -> np.ndarray:
        """[F, Bm] host copy of the model's per-feature split-threshold
        grid (strictly increasing, +inf lane-padded) — shared by the
        device pack (_pack_matmul_bins) and host-side binning
        (_eval_matrix_hostbin). Cached per width: RF per-bag scoring and
        the -sparse chunked scorer call eval_matrix repeatedly and must
        not rebuild the O(nodes) python loop each time (invalidated with
        the rest of the packs by add/truncate via _bins_meta)."""
        uniq, Bm_real = self._bins_grid_meta()
        cached = getattr(self, "_gridnp", None)
        # identity of the cached meta dict (a held reference, so its id
        # cannot be recycled) marks staleness after add/truncate
        if cached is None or cached[0] is not uniq or cached[1] != n_features:
            Bm = ((Bm_real + 127) // 128) * 128
            grid = np.full((n_features, Bm), np.inf, np.float32)
            for f, s in uniq.items():
                if f < n_features:
                    v = np.sort(np.asarray(list(s), np.float32))
                    grid[f, : len(v)] = v
            self._gridnp = (uniq, n_features, grid)
        return self._gridnp[2]

    def _use_bins_kernel(self, n_features: int) -> bool:
        """Route preference for the bin-space kernel (exact, one bf16
        selection pass — 43.1 ms vs 52.9 for the 3-plane kernel at 262K
        docs × 1000 trees, v5e 2026-08-20). Same TPU + VMEM gating
        discipline as _use_forest_kernel; TN=4096 measured a 416 KB VMEM
        overrun at this shape, so the estimate matters. Additionally the
        kernel's exactness REQUIRES bin ids ≤ 256 (the bf16 integer
        range): a feature with more distinct split thresholds than that
        (-tc above 256, or an externally trained model) routes to the
        3-plane kernel instead."""
        import os

        from ranklib_tpu.utils.backend import on_tpu

        if not on_tpu() or os.environ.get(
                "RANKLIB_TPU_FOREST_KERNEL", "1") == "0" or os.environ.get(
                "RANKLIB_TPU_BINS_KERNEL", "1") == "0":
            return False
        uniq, Bm_real = self._bins_grid_meta()
        if Bm_real > 256:
            return False
        M = max(max((~t.is_leaf).sum(), 1) for t in self.trees)
        L = max(t.is_leaf.sum() for t in self.trees)
        TC = self._TREE_CHUNK
        TCM = ((TC * M + 15) // 16) * 16
        TCLp = ((TC * L + 127) // 128) * 128
        Fp = ((n_features + 127) // 128) * 128
        from ranklib_tpu.ops.forest_eval import _TN as TN
        Bm = ((Bm_real + 127) // 128) * 128
        est = (2 * (Fp * TN * 4)              # xt f32, double-buffered
               + 2 * (Fp * Bm * 4)            # grid
               + 2 * (TCM * Fp * 2)           # sel bf16
               + 2 * (TCM * 128 * 4)          # node bins
               + 2 * (TCM * TCLp * 2)         # pmq bf16
               + 2 * (8 * TCLp * 4)           # aux
               + 8 * TN * 4                   # out accumulator
               + Fp * TN * 2                  # bins scratch
               + TCM * TN * 4                 # vals
               + TCM * TN * 2                 # pred bf16
               + TN * TCLp * 4)               # hits
        return est <= self._KERNEL_VMEM_BUDGET

    def _device_eval_fn(self, n_features: int):
        """(fn, chunk): fn maps a device-resident [n, F] f32 block to
        device scores [n]. The serving hot path — shared by eval_matrix
        and the bench. Route: bin-space Pallas kernel (exact, fastest) →
        3-plane Pallas kernel → XLA scan (CPU / oversized models)."""
        if self._use_bins_kernel(n_features):
            import os

            *binpack, n_grid = self._pack_matmul_bins(n_features)
            if os.environ.get("RANKLIB_TPU_SERVE_SPLIT") == "1":
                # opt-in two-kernel variant (bin pass to HBM + selection
                # at a doubled doc tile): measured exact but no faster
                # than the fused kernel (tools/exp_serving_split_bins.py
                # — 64.0 ms at TN=8192 vs 64.8 fused on the same
                # session); kept reachable for re-measurement on future
                # hardware/compiler bumps
                from ranklib_tpu.ops.forest_eval import (
                    forest_eval_pallas_bins_split,
                )
                return (lambda X: forest_eval_pallas_bins_split(
                    X, *binpack, n_grid=n_grid)), self._EVAL_CHUNK_KERNEL
            from ranklib_tpu.ops.forest_eval import forest_eval_pallas_bins
            return (lambda X: forest_eval_pallas_bins(
                X, *binpack, n_grid=n_grid)), self._EVAL_CHUNK_KERNEL
        packed = self._pack_matmul(n_features)
        if self._use_forest_kernel(n_features):
            from ranklib_tpu.ops.forest_eval import forest_eval_pallas_full
            return (lambda X: forest_eval_pallas_full(X, *packed)), \
                self._EVAL_CHUNK_KERNEL
        return (lambda X: _mm_eval(X, *packed)), self._EVAL_CHUNK

    def eval_matrix(self, feats: np.ndarray) -> np.ndarray:
        """feats [N, F] → scores [N] = Σ_t w_t · tree_t(x).

        One host→device upload, device-side doc chunking, one download.
        On TPU a fused Pallas kernel scores everything in VMEM
        (ops.forest_eval: bin-space 43.1 ms / 3-plane 52.9 ms vs 115 ms
        for the XLA scan at 262K docs × 1000 trees — all exact);
        elsewhere the XLA scan path runs."""
        if not self.trees:
            return np.zeros(feats.shape[0], np.float32)
        import os

        # (SERVE_SPLIT=1 — the opt-in split-kernel re-measurement route —
        # must win over the hostbin short-circuit or it silently times
        # the frombins path instead)
        if (os.environ.get("RANKLIB_TPU_SERVE_HOSTBIN", "1") != "0"
                and os.environ.get("RANKLIB_TPU_SERVE_SPLIT") != "1"
                and self._use_bins_kernel(feats.shape[1])):
            return self._eval_matrix_hostbin(
                np.asarray(feats, np.float32))
        eval_fn, C = self._device_eval_fn(feats.shape[1])
        Xd = jnp.asarray(feats, jnp.float32)
        return self._chunked_eval(Xd, eval_fn, feats.shape[0], C, axis=0)

    @staticmethod
    def _chunked_eval(Xd, eval_fn, N: int, C: int, axis: int) -> np.ndarray:
        """Doc-chunked device eval shared by the f32 and host-binned
        routes (docs live on axis 0 / 1 respectively). Full C-sized
        chunks share one compiled program; the tail runs at its true
        length (both eval paths handle any N internally) instead of
        padding N up to a C multiple — padding 1.05M docs to 2M nearly
        doubled upload + kernel work."""
        if N <= C:
            return np.asarray(eval_fn(Xd))[:N]
        parts = []
        for lo in range(0, N, C):
            if lo + C <= N:
                part = jax.lax.dynamic_slice_in_dim(Xd, lo, C, axis)
            else:
                part = (Xd[lo:N] if axis == 0 else Xd[:, lo:N])
            parts.append(eval_fn(part))
        return np.asarray(jnp.concatenate(parts))[:N]

    def _eval_matrix_hostbin(self, feats: np.ndarray) -> np.ndarray:
        """Bin-space serving with HOST-side binning + PIPELINED integer
        upload.

        eval_matrix always starts from host features, and through the
        device tunnel the f32 upload dominates end-to-end scoring
        (4 bytes/feature/doc — ~2.2 GB for 4M docs × 136 feats against a
        ~40 ms kernel). Two structural fixes live here:

        * HOST BINNING: docs bin against the model grid on the host
          (native multithreaded binner; the kernel prologue's exact rule
          ``bin = #{grid < x}``, NaN → n_grid to match the dense path's
          ``NaN <= t == False`` right-routing) and only the 1–2
          byte/feature/doc bin matrix crosses the tunnel. Scores are
          bit-identical to forest_eval_pallas_bins — same selection math
          on the same bin ids.
        * PIPELINING (VERDICT r04 #3): one monolithic device_put both
          collapses tunnel bandwidth at multi-GB sizes (measured 224 MB/s
          at 544 MB → 15 MB/s at 2.2 GB) and serializes bin → upload →
          kernel. Docs now stream in ~RANKLIB_TPU_SERVE_CHUNK_MB-sized
          chunks (default 8 MB — swept 8/16/32/64 on-chip 2026-08-21,
          tools/exp_serving_pipeline.py: 835/900/1364/1386 ms at 262K
          docs × 1000 trees vs 3350 ms for the monolithic path — 4.0×;
          quantized to the kernel's doc tile): a single worker thread
          host-bins chunk i+1 while the main thread uploads chunk i and
          async-dispatches its kernel, so binning and device compute hide
          behind the link. The tail chunk host-pads to a _TN multiple so
          kernel program shapes stay quantized. At 4.2M docs × 1000
          trees: 12.8 s end-to-end (was 39.8 s monolithic-hostbin /
          80-111 s f32), checksum-exact.

        A per-call phase breakdown lands in ``self.last_serve_breakdown``
        (chunk geometry, worker bin-ms sum, put-enqueue-ms sum, final
        sync, wall). Read it knowing the pipeline's async semantics:
        ``put_ms`` times only the device_put ENQUEUE (device_put returns
        before bytes move — measured directly in
        tools/exp_upload_rate.py: 33 ms put vs ~2 s to a value read at
        32 MB), so the actual link-transfer time lands in ``sync_ms``
        together with kernel tail time; ``bin_ms`` sums worker-thread
        wall that mostly overlaps the link. Phases overlap by design —
        sums can exceed wall_ms, and wall_ms is the only end-to-end
        truth. Kill switches:
        RANKLIB_TPU_SERVE_HOSTBIN=0 (route off), RANKLIB_TPU_SERVE_CHUNK_MB
        (chunk budget)."""
        import os
        import time
        from concurrent.futures import ThreadPoolExecutor

        from ranklib_tpu.gbdt.binning import bin_features
        from ranklib_tpu.native.loader import native_bin_features_transposed
        from ranklib_tpu.ops.forest_eval import (
            _TN, forest_eval_pallas_frombins,
        )

        N, F = feats.shape
        if N == 0:
            return np.zeros(0, np.float32)
        _grid_j, fid_full, nodebin, PmQc, csQc, plenc, outwc, n_grid = (
            self._pack_matmul_bins(F))
        grid = self._model_grid_np(F)
        dt = np.uint8 if n_grid < 256 else np.int16

        def fn(part):
            return forest_eval_pallas_frombins(part, fid_full, nodebin,
                                               PmQc, csQc, plenc, outwc,
                                               n_grid=int(n_grid))

        try:
            budget_mb = float(
                os.environ.get("RANKLIB_TPU_SERVE_CHUNK_MB", "8"))
        except ValueError:
            budget_mb = 8.0
        if budget_mb <= 0:          # 0/negative would mean one kernel
            budget_mb = 8.0         # dispatch per doc through the link
        C = int(budget_mb * (1 << 20)) // max(1, F * np.dtype(dt).itemsize)
        C = max(1, min(self._EVAL_CHUNK_KERNEL, C))
        if C >= _TN:
            C = (C // _TN) * _TN           # full chunks share one program

        bd = {"n_chunks": -(-N // C), "chunk_docs": C,
              "bin_ms": 0.0, "put_ms": 0.0}

        def prep(lo: int) -> np.ndarray:
            t0 = time.perf_counter()
            hi = min(lo + C, N)
            chunk = feats[lo:hi]
            # fused native pass: bin + clamp-to-n_grid + narrow +
            # transpose in one sweep. The clamp is exact: node bins are
            # < n_grid, finite doc bins are <= n_grid, and every id
            # >= n_grid routes right — NaN (which IEEE-bins past the
            # +inf pad to Bm >= n_grid) included, so the old isnan mask
            # pass is subsumed.
            binsT = native_bin_features_transposed(chunk, grid,
                                                   int(n_grid), dt)
            if binsT is None:              # numpy ladder fallback
                bins = bin_features(chunk, grid)
                np.minimum(bins, n_grid, out=bins)
                binsT = np.ascontiguousarray(bins.astype(dt).T)
            n = hi - lo
            npad = -(-n // _TN) * _TN
            if npad > n and hi == N and C >= _TN:
                # host-pad the tail: the kernel would pad on-device
                # anyway, and quantized shapes bound distinct programs
                binsT = np.pad(binsT, ((0, 0), (0, npad - n)))
            bd["bin_ms"] += (time.perf_counter() - t0) * 1e3
            return binsT

        parts = []
        t_wall = time.perf_counter()
        with ThreadPoolExecutor(max_workers=1) as ex:
            fut = ex.submit(prep, 0)
            for lo in range(0, N, C):
                binsT = fut.result()
                if lo + C < N:
                    fut = ex.submit(prep, lo + C)
                t0 = time.perf_counter()
                Xd = jax.device_put(binsT)
                # enqueue time only — the transfer itself completes
                # asynchronously and is accounted in sync_ms
                bd["put_ms"] += (time.perf_counter() - t0) * 1e3
                parts.append(fn(Xd))       # async dispatch: kernel for
                #                            chunk i overlaps put(i+1)
        t0 = time.perf_counter()
        out = np.asarray(parts[0] if len(parts) == 1
                         else jnp.concatenate(parts))[:N]
        bd["sync_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
        bd["wall_ms"] = round((time.perf_counter() - t_wall) * 1e3, 1)
        bd["bin_ms"] = round(bd["bin_ms"], 1)
        bd["put_ms"] = round(bd["put_ms"], 1)
        self.last_serve_breakdown = bd
        return out

    # ---- text format ---------------------------------------------------------
    def to_text(self) -> str:
        lines = ["<ensemble>"]
        for i, (t, w) in enumerate(zip(self.trees, self.weights)):
            lines.append(f"\t<tree id=\"{i + 1}\" weight=\"{w}\">")
            lines.extend(_node_text(t, 0, 2))
            lines.append("\t</tree>")
        lines.append("</ensemble>")
        return "\n".join(lines) + "\n"

    @staticmethod
    def from_text(text: str) -> "TreeEnsemble":
        """Parse the reference's ensemble XML (tolerates whitespace in
        <feature>/<threshold>/<output> text, as RankLib emits)."""
        start = text.find("<ensemble>")
        if start < 0:
            raise RankLibError("No <ensemble> found in model text")
        end = text.find("</ensemble>") + len("</ensemble>")
        try:
            root = ET.fromstring(text[start:end])
        except ET.ParseError as e:
            raise RankLibError(f"Bad ensemble XML: {e}") from e
        ens = TreeEnsemble()
        for tree_el in root.findall("tree"):
            weight = float(tree_el.get("weight", "1.0"))
            split = tree_el.find("split")
            if split is None:
                raise RankLibError("<tree> without <split>")
            nodes = []
            _parse_split(split, nodes)
            ens.add(_tree_from_nodes(nodes), weight)
        return ens


def _node_text(t: Tree, node: int, indent: int, pos: str | None = None):
    """Explicit-stack DFS (leaf-wise growth can produce chain trees of
    depth ~n_leaves; one Python frame per level RecursionError'd at save
    time past ~1000 — review finding, round 5)."""
    lines = []
    stack = [("open", node, indent, pos)]
    while stack:
        kind, nd, ind, ps = stack.pop()
        tab = "\t" * ind
        if kind == "close":
            lines.append(f"{tab}</split>")
            continue
        attr = f" pos=\"{ps}\"" if ps else ""
        lines.append(f"{tab}<split{attr}>")
        if t.is_leaf[nd]:
            lines.append(f"{tab}\t<output> {t.output[nd]:.15f} </output>")
            lines.append(f"{tab}</split>")
        else:
            lines.append(
                f"{tab}\t<feature> {int(t.feature[nd]) + 1} </feature>")
            lines.append(f"{tab}\t<threshold> {t.threshold[nd]} </threshold>")
            stack.append(("close", nd, ind, None))
            stack.append(("open", int(t.right[nd]), ind + 1, "right"))
            stack.append(("open", int(t.left[nd]), ind + 1, "left"))
    return lines


def _parse_split(el, nodes) -> int:
    """Descent over <split> elements → flat node list; returns the root
    slot index. Explicit work stack (files from other tools can carry
    chain trees past the Python recursion limit — review finding);
    pre-order slot assignment matches the old recursion exactly."""
    root_idx = len(nodes)
    stack = [el]
    # pass 1: pre-order slot assignment (parent before left before right)
    order = []
    while stack:
        e = stack.pop()
        idx = len(nodes)
        nodes.append(None)
        order.append((e, idx))
        if e.find("feature") is not None:
            kids = {c.get("pos"): c for c in e.findall("split")}
            if "left" not in kids or "right" not in kids:
                raise RankLibError("Internal <split> missing left/right child")
            stack.append(kids["right"])
            stack.append(kids["left"])
    # pre-order via a LIFO visits parent, then the whole left subtree,
    # then the right subtree — exactly the recursive numbering. Record
    # each element's slot, then fill nodes with child links.
    slot_of = {id(e): idx for e, idx in order}
    for e, idx in order:
        out_el = e.find("output")
        feat_el = e.find("feature")
        if feat_el is not None:
            thr_el = e.find("threshold")
            kids = {c.get("pos"): c for c in e.findall("split")}
            nodes[idx] = (int(feat_el.text.strip()) - 1,
                          float(thr_el.text.strip()),
                          slot_of[id(kids["left"])],
                          slot_of[id(kids["right"])], False, 0.0)
        elif out_el is not None:
            nodes[idx] = (0, 0.0, -1, -1, True, float(out_el.text.strip()))
        else:
            raise RankLibError("<split> with neither children nor <output>")
    return root_idx


def _tree_from_nodes(nodes) -> Tree:
    return Tree(
        [n[0] for n in nodes], [n[1] for n in nodes], [n[2] for n in nodes],
        [n[3] for n in nodes], [n[4] for n in nodes], [n[5] for n in nodes],
    )


@jax.jit
def _mm_eval(X, fid_full, thr_full, PmQc, csQc, plenc, outwc):
    """Gather + path-matmul ensemble scoring; see _pack_matmul for the
    encoding and the class comment for the measured design history.

    X: [N, F]. All predicates come from ONE static row gather of X^T
    (each predicate row reads exactly one feature — exact in f32, no
    matmul rounding to guard against); the single path matmul per tree
    chunk contracts the sublane dim of the transposed predicate matrix:

        hits = pred @ (P−Q) + colsum(Q)

    equals the path-agreement count pred @ P + (1−pred) @ Q. Numerics:
    `pred` is 0/1, (P−Q) ∈ {−1,0,1} and the counts are small integers
    (≤ path depth ≤ slot count) — all exact in bf16. Only the final
    leaf-output matmul touches real-valued training outputs; it keeps
    HIGHEST precision (it is [N, TC·L]·[TC·L] per chunk — tiny).
    CPU XLA lacks bf16×bf16→f32 dots, so the predicate dtype falls back
    to f32 off-TPU (trace-time choice; results identical either way)."""
    from ranklib_tpu.utils.backend import on_tpu
    pdt = jnp.bfloat16 if on_tpu() else jnp.float32
    valsT = jnp.take(X.T, fid_full, axis=0)          # [T·M, N] row gather
    predT = (valsT <= thr_full[:, None]).astype(pdt)
    nch, TCM, _ = PmQc.shape

    def chunk(score, args):
        c, PmQ, csQ, plen, outw = args
        pT = jax.lax.dynamic_slice_in_dim(predT, c * TCM, TCM, axis=0)
        hits = jax.lax.dot_general(
            pT, PmQ.astype(pdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + csQ[None, :]
        ind = (hits == plen[None, :]).astype(jnp.float32)
        return score + jnp.dot(ind, outw,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST), None

    score, _ = jax.lax.scan(
        chunk, jnp.zeros((X.shape[0],), jnp.float32),
        (jnp.arange(nch, dtype=jnp.int32), PmQc, csQc, plenc, outwc))
    return score


@functools.partial(jax.jit, static_argnames=("depth",))
def _ensemble_eval(X, feat, thr, lft, rgt, leaf, out, w, depth: int):
    """X [N, F]; tree arrays [T, M] → scores [N].

    Traversal: per tree, all docs descend in lockstep — `depth` rounds of
    (gather split feature value, compare, select child). Leaves self-loop
    via the is_leaf select.
    """
    N = X.shape[0]

    def one_tree(f_, t_, l_, r_, lf_, o_):
        def body(_, node):
            v = jnp.take_along_axis(X, f_[node][:, None], axis=1)[:, 0]
            nxt = jnp.where(v <= t_[node], l_[node], r_[node])
            return jnp.where(lf_[node], node, nxt)

        node = jax.lax.fori_loop(0, depth, body,
                                 jnp.zeros((N,), jnp.int32))
        return o_[node]

    per_tree = jax.vmap(one_tree)(feat, thr, lft, rgt, leaf, out)   # [T, N]
    return jnp.einsum("t,tn->n", w, per_tree,
                      preferred_element_type=jnp.float32)
