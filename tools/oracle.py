"""Independent RankLib-semantics oracle: pure numpy float64, deliberately slow.

This module is the *falsifier* for the production engine's parity claim
(BASELINE.json north_star: NDCG@10 within ±0.002 of RankLib). It
re-implements the reference algorithm the way the reference describes it —
per-query nested pair loops, brute-force metric recomputation for swap
deltas, explicit per-node histograms scanned feature-major, best-first
leaf-wise growth, Newton leaf outputs, validation early-stop and best-round
rollback — and shares NO code with `ranklib_tpu` (it does not even import
it). Tests pin multi-round end-to-end agreement (tree structures, leaf
outputs, metric trajectories) between this oracle and the fused TPU-shaped
engine.

Reference anchors (SURVEY.md canonical paths; the mount is empty):
  * lambdas:   learning/tree/LambdaMART.java:~300 computePseudoResponses
  * histogram: learning/tree/FeatureHistogram.java:~300 findBestSplit
  * growth:    learning/tree/RegressionTree.java:~60 fit (best-first queue)
  * outputs:   learning/tree/LambdaMART.java:~400 updateTreeOutput
  * estop:     learning/tree/LambdaMART.java:~200 learn() rollback
  * metrics:   metric/{NDCG,DCG,ERR,AP,Precision}Scorer.java
  * sort ties: utilities/MergeSorter.java (stable, original index wins)

Precision contract: all statistics (gradients, histogram sums, gains,
deviances, leaf outputs, model scores) are float64. The ONE deliberate
f32 touchpoint is threshold values: the model-file format stores float32
thresholds, so candidate split values are rounded to float32 exactly like
the engine's `compute_thresholds` — otherwise a doc sitting on a grid
boundary could bin differently for reasons that are representation, not
algorithm. Everything downstream of binning is f64.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np


# ---------------------------------------------------------------------------
# Metrics: direct per-ranked-list recomputation (no closed forms).


def metric_value(name: str, L, k: int, gmax: float = 4.0) -> float:
    """Metric of one ranked label list (python list / 1-D array, f64)."""
    n = len(L)
    if name == "DCG":
        return _dcg(L, k)
    if name == "NDCG":
        ideal = _dcg(sorted(L, reverse=True), k)
        return _dcg(L, k) / ideal if ideal > 0 else 0.0
    if name == "ERR":
        ke = n if k <= 0 else min(k, n)
        p, s = 1.0, 0.0
        for r in range(ke):
            R = (2.0 ** L[r] - 1.0) / (2.0 ** gmax)
            s += p * R / (r + 1)
            p *= 1.0 - R
        return s
    if name == "MAP":
        hits, s, total = 0, 0.0, sum(1 for x in L if x > 0)
        for r, x in enumerate(L):
            if x > 0:
                hits += 1
                s += hits / (r + 1)
        return s / total if total > 0 else 0.0
    if name == "P":
        ke = n if k <= 0 else min(k, n)
        hits = sum(1 for x in L[:ke] if x > 0)
        return hits / ke if ke > 0 else 0.0
    if name == "RR":
        ke = n if k <= 0 else min(k, n)
        for r in range(ke):
            if L[r] > 0:
                return 1.0 / (r + 1)
        return 0.0
    if name == "BEST":
        ke = n if k <= 0 else min(k, n)
        return max(max(L[:ke], default=0.0), 0.0) if ke > 0 else 0.0
    raise ValueError(f"unknown metric {name}")


def _dcg(L, k: int) -> float:
    n = len(L)
    ke = n if k <= 0 else min(k, n)
    return sum((2.0 ** L[r] - 1.0) / math.log2(r + 2) for r in range(ke))


def swap_delta(name: str, L, i: int, j: int, k: int,
               gmax: float = 4.0) -> float:
    """Metric change from swapping ranked positions i and j — brute force:
    swap, recompute, subtract (the reference's MetricScorer.swapChange
    contract, computed the slow honest way)."""
    base = metric_value(name, L, k, gmax)
    Ls = list(L)
    Ls[i], Ls[j] = Ls[j], Ls[i]
    return metric_value(name, Ls, k, gmax) - base


# ---------------------------------------------------------------------------
# Lambda gradients: per-query nested pair loops.


def ranked_order(scores) -> np.ndarray:
    """Stable score-descending permutation: ties broken by original index
    (MergeSorter semantics)."""
    return np.argsort(-np.asarray(scores, np.float64), kind="stable")


def lambda_gradients(labels, scores, metric: str, k: int,
                     gmax: float = 4.0):
    """(lam, w) per doc, in ORIGINAL doc order, f64.

    For every ordered pair of ranked positions (i, j) with L_i > L_j:
        rho = 1 / (1 + exp(s_i − s_j))
        lam_i += rho·|Δ|,  lam_j −= rho·|Δ|
        w_i   += rho(1−rho)·|Δ|  (and the same for j)
    """
    labels = np.asarray(labels, np.float64)
    scores = np.asarray(scores, np.float64)
    n = len(labels)
    order = ranked_order(scores)
    L = labels[order]
    S = scores[order]
    lam = np.zeros(n)
    w = np.zeros(n)
    base = metric_value(metric, list(L), k, gmax)
    for i in range(n):
        for j in range(n):
            if L[i] > L[j]:
                Ls = list(L)
                Ls[i], Ls[j] = Ls[j], Ls[i]
                delta = abs(metric_value(metric, Ls, k, gmax) - base)
                rho = 1.0 / (1.0 + math.exp(min(S[i] - S[j], 700.0)))
                lam[i] += rho * delta
                lam[j] -= rho * delta
                ww = rho * (1.0 - rho) * delta
                w[i] += ww
                w[j] += ww
    out_l = np.zeros(n)
    out_w = np.zeros(n)
    out_l[order] = lam
    out_w[order] = w
    return out_l, out_w


# ---------------------------------------------------------------------------
# Binning (thresholds stored as float32, statistics in f64).


def compute_thresholds_oracle(feats, n_threshold: int):
    """Per-feature candidate split values: all uniques when ≤ n_threshold,
    else an evenly spaced min→max grid with last point == max. Returns a
    list of 1-D float32 arrays (no padding)."""
    feats = np.asarray(feats, np.float32)
    out = []
    for f in range(feats.shape[1]):
        vals = np.unique(feats[:, f])
        if len(vals) > n_threshold:
            grid = np.linspace(float(vals[0]), float(vals[-1]),
                               n_threshold, dtype=np.float32)
            grid[-1] = vals[-1]
            vals = grid
        out.append(vals.astype(np.float32))
    return out


def bin_column(values, thresholds) -> np.ndarray:
    """Smallest b with value <= thresholds[b] (== len(thr) when above max:
    routed right forever)."""
    return np.searchsorted(thresholds, np.asarray(values, np.float32),
                           side="left").astype(np.int64)


# ---------------------------------------------------------------------------
# Regression tree: best-first leaf-wise growth, explicit histograms.


@dataclass
class OracleNode:
    docs: np.ndarray                    # int64 indices into the training set
    S: float = 0.0                      # Σ grad
    SQ: float = 0.0                     # Σ grad²
    C: float = 0.0                      # Σ count
    deviance: float = -math.inf
    best_gain: float = -math.inf
    best_f: int = -1
    best_b: int = -1
    splittable: bool = False
    # structure
    feature: int = -1
    bin: int = -1
    left: int = -1
    right: int = -1
    is_leaf: bool = True
    output: float = 0.0


@dataclass
class OracleTree:
    nodes: list                          # slot order == creation order
    thresholds: list                     # per-feature f32 arrays

    def leaf_of(self, x) -> int:
        """Traverse one raw feature vector to its leaf slot."""
        node = 0
        while not self.nodes[node].is_leaf:
            nd = self.nodes[node]
            thr = float(self.thresholds[nd.feature][nd.bin])
            node = nd.left if float(x[nd.feature]) <= thr else nd.right
        return node

    def predict(self, X) -> np.ndarray:
        return np.array([self.nodes[self.leaf_of(x)].output for x in X],
                        np.float64)


def _node_stats(docs, grad):
    g = grad[docs]
    return float(g.sum()), float((g * g).sum()), float(len(docs))


def _node_deviance(S, SQ, C):
    return SQ - S * S / C if C > 0 else -math.inf


def _best_split_oracle(docs, binned_cols, grad, mls: float):
    """Scan every (feature, bin) candidate of one node feature-major;
    first strict max wins (the reference's scan order)."""
    best = (-math.inf, -1, -1)
    g = grad[docs]
    for f, col in enumerate(binned_cols):
        b_of_doc = col[docs]
        nb = int(b_of_doc.max()) + 1 if len(b_of_doc) else 0
        cnt = np.bincount(b_of_doc, minlength=nb).astype(np.float64)
        s = np.bincount(b_of_doc, weights=g, minlength=nb)
        c_total, s_total = cnt.sum(), s.sum()
        c_l = s_l = 0.0
        for b in range(nb):
            c_l += cnt[b]
            s_l += s[b]
            c_r = c_total - c_l
            s_r = s_total - s_l
            if c_l >= mls and c_r >= mls:
                gain = s_l * s_l / c_l + s_r * s_r / c_r
                if gain > best[0]:
                    best = (gain, f, b)
    return best + (math.isfinite(best[0]),)


def grow_tree_oracle(binned_cols, grad, n_leaves: int, mls: float,
                     thresholds) -> tuple:
    """Best-first growth to ≤ n_leaves leaves. Returns (OracleTree,
    node_of_doc, impact_per_feature).

    Queue discipline: pop the splittable leaf with maximum deviance (root
    seeded +inf so it always pops first); equal deviances break toward the
    earliest-created slot. Child nodes are appended left-then-right, so
    slot numbering matches creation order.
    """
    n = len(grad)
    F = len(binned_cols)
    all_docs = np.arange(n, dtype=np.int64)
    root = OracleNode(docs=all_docs)
    root.S, root.SQ, root.C = _node_stats(all_docs, grad)
    root.deviance = math.inf
    (root.best_gain, root.best_f, root.best_b,
     root.splittable) = _best_split_oracle(all_docs, binned_cols, grad, mls)
    nodes = [root]
    impacts = np.zeros(F)

    for _ in range(n_leaves - 1):
        pick, pick_dev = -1, -math.inf
        for idx, nd in enumerate(nodes):
            if nd.is_leaf and nd.splittable and nd.deviance > pick_dev:
                pick, pick_dev = idx, nd.deviance
        if pick < 0:
            break
        nd = nodes[pick]
        f, b = nd.best_f, nd.best_b
        col = binned_cols[f][nd.docs]
        left_docs = nd.docs[col <= b]
        right_docs = nd.docs[col > b]
        parent_term = nd.S * nd.S / nd.C if nd.C > 0 else 0.0
        impacts[f] += nd.best_gain - parent_term

        children = []
        for docs in (left_docs, right_docs):
            ch = OracleNode(docs=docs)
            ch.S, ch.SQ, ch.C = _node_stats(docs, grad)
            ch.deviance = _node_deviance(ch.S, ch.SQ, ch.C)
            (ch.best_gain, ch.best_f, ch.best_b,
             ch.splittable) = _best_split_oracle(docs, binned_cols, grad, mls)
            children.append(ch)
        nd.feature, nd.bin = f, b
        nd.left = len(nodes)
        nd.right = len(nodes) + 1
        nd.is_leaf = False
        nodes.extend(children)

    node_of_doc = np.zeros(n, np.int64)
    for idx, nd in enumerate(nodes):
        if nd.is_leaf:
            node_of_doc[nd.docs] = idx
    return OracleTree(nodes, thresholds), node_of_doc, impacts


def set_leaf_outputs(tree: OracleTree, node_of_doc, lam, w,
                     newton: bool) -> None:
    """Newton Σλ/Σw (LambdaMART) or mean response Σλ/count (MART)."""
    for idx, nd in enumerate(tree.nodes):
        if not nd.is_leaf:
            nd.output = 0.0
            continue
        sel = node_of_doc == idx
        s1 = float(lam[sel].sum())
        s2 = float(w[sel].sum()) if newton else float(sel.sum())
        nd.output = s1 / s2 if s2 > 0 else 0.0


# ---------------------------------------------------------------------------
# The boosting loop.


@dataclass
class OracleQuery:
    labels: np.ndarray                  # [n] f64
    feats: np.ndarray                   # [n, F] f32


@dataclass
class OracleLambdaMART:
    """Reference-semantics gradient-boosted ranker.

    pointwise=False, newton=True  → LambdaMART
    pointwise=True,  newton=False → MART
    """

    n_trees: int = 50
    n_leaves: int = 10
    learning_rate: float = 0.1
    n_threshold: int = 256
    min_leaf_support: float = 1.0
    early_stop: int = 100
    estop_check_every: int = 1          # engine checks every min(estop,50)
    #   rounds in silent mode; mirror by setting this accordingly
    metric: str = "NDCG"
    k: int = 10
    gmax: float = 4.0
    pointwise: bool = False
    newton: bool = True
    trees: list = field(default_factory=list)        # kept OracleTrees
    train_metrics: list = field(default_factory=list)
    val_metrics: list = field(default_factory=list)
    impacts: np.ndarray | None = None

    # -- scoring helpers ----------------------------------------------------
    def _dataset_metric(self, queries, scores_per_q) -> float:
        total = 0.0
        for q, sc in zip(queries, scores_per_q):
            order = ranked_order(sc)
            total += metric_value(self.metric, list(q.labels[order]),
                                  self.k, self.gmax)
        return total / len(queries)

    def predict_query(self, q: OracleQuery) -> np.ndarray:
        out = np.zeros(q.feats.shape[0])
        for tree in self.trees:
            out += self.learning_rate * tree.predict(q.feats)
        return out

    # -- training -------------------------------------------------------------
    def fit(self, train: list, validation: list | None = None) -> None:
        """train/validation: lists of OracleQuery."""
        feats = np.concatenate([q.feats for q in train], axis=0)
        labels = np.concatenate([q.labels for q in train], axis=0)
        qptr = np.cumsum([0] + [q.feats.shape[0] for q in train])
        n = feats.shape[0]
        F = feats.shape[1]
        thresholds = compute_thresholds_oracle(feats, self.n_threshold)
        binned_cols = [bin_column(feats[:, f], thresholds[f])
                       for f in range(F)]

        scores = np.zeros(n)
        vscores = ([np.zeros(q.feats.shape[0]) for q in validation]
                   if validation else None)
        self.trees = []
        self.train_metrics = []
        self.val_metrics = []
        self.impacts = np.zeros(F)
        all_trees = []

        for t in range(self.n_trees):
            # pseudo-responses
            if self.pointwise:
                lam = labels - scores
                w = np.ones(n)
            else:
                lam = np.zeros(n)
                w = np.zeros(n)
                for qi in range(len(train)):
                    s, e = qptr[qi], qptr[qi + 1]
                    l_, w_ = lambda_gradients(labels[s:e], scores[s:e],
                                              self.metric, self.k, self.gmax)
                    lam[s:e] = l_
                    w[s:e] = w_

            tree, node_of_doc, imp = grow_tree_oracle(
                binned_cols, lam, self.n_leaves, self.min_leaf_support,
                thresholds)
            set_leaf_outputs(tree, node_of_doc, lam, w, self.newton)
            self.impacts += imp
            all_trees.append(tree)
            out = np.array([tree.nodes[s].output for s in node_of_doc])
            scores = scores + self.learning_rate * out

            tm = self._dataset_metric(
                train, [scores[qptr[i]: qptr[i + 1]]
                        for i in range(len(train))])
            self.train_metrics.append(tm)

            if validation:
                for vi, q in enumerate(validation):
                    vscores[vi] = vscores[vi] + (
                        self.learning_rate * tree.predict(q.feats))
                vm = self._dataset_metric(validation, vscores)
                self.val_metrics.append(vm)
                if (self.early_stop > 0
                        and (t + 1) % max(1, self.estop_check_every) == 0):
                    best = int(np.argmax(self.val_metrics))
                    if t - best >= self.early_stop:
                        break

        keep = len(all_trees)
        if validation and self.val_metrics:
            keep = int(np.argmax(self.val_metrics)) + 1
        self.trees = all_trees[:keep]


def dataset_to_oracle(ds) -> list:
    """Adapter: a ranklib_tpu Dataset (duck-typed: .queries with .labels /
    .feats) → list[OracleQuery]. Lives here so tests don't re-write it, but
    the oracle itself never imports ranklib_tpu."""
    return [OracleQuery(labels=np.asarray(q.labels, np.float64),
                        feats=np.asarray(q.feats, np.float32))
            for q in ds.queries]
