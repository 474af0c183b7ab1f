"""MART (`-ranker 0`) and LambdaMART (`-ranker 6`).

Reference behavior (learning/tree/LambdaMART.java:~40 init, :~200 learn;
learning/tree/MART.java:~15):

* init: flatten all docs, compute ≤ nThreshold candidate split values per
  feature, pre-bin;
* per tree: pseudo-responses (lambda gradients for LambdaMART, plain
  residuals label − score for MART) → fit a leaf-wise regression tree on
  them → re-estimate leaf outputs (Newton Σλ/Σw for LambdaMART, mean
  residual for MART) → modelScores += learningRate · tree(x);
* validation scored every round; after the loop the ensemble is truncated
  to the best validation round; training stops early after ``-estop``
  rounds without validation improvement.

TPU-first: the pair-gradient phase is a batched [B, D, D] program, tree
growth is one jitted fori_loop (gbdt.grow), scoring is vectorized
traversal (gbdt.ensemble). Hyperparameter flags/defaults: ``-tree`` 1000,
``-leaf`` 10, ``-shrinkage`` 0.1, ``-tc`` 256, ``-mls`` 1, ``-estop`` 100.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ranklib_tpu.data.dataset import Dataset, flatten
from ranklib_tpu.gbdt.binning import bin_features, compute_thresholds
from ranklib_tpu.gbdt.ensemble import Tree, TreeEnsemble
from ranklib_tpu.gbdt.grow import grow_tree, leaf_outputs
from ranklib_tpu.gbdt.lambdas import lambda_round, make_bucket_views
from ranklib_tpu.metrics.base import MetricScorer
from ranklib_tpu.models.base import (
    Ranker, model_header, parse_model_params, register_ranker,
)
from ranklib_tpu.ops.batched_eval import _bucket_score_metrics
from ranklib_tpu.utils.errors import RankLibError
from ranklib_tpu.utils.logging import log


def _views_metric(scorer, views, scores_flat, n_queries) -> float:
    """Macro-averaged metric of current model scores over bucket views."""
    total = 0.0
    for v in views:
        vals = _bucket_score_metrics(scorer, v.labels, v.mask,
                                     v.gather(scores_flat))
        total += float(np.asarray(vals)[: v.B].sum())
    return total / n_queries


@register_ranker
class LambdaMART(Ranker):
    NAME = "LambdaMART"
    _NEWTON = True          # leaf output Σλ/Σw (MART overrides to mean)

    def __init__(self, **hp):
        self.n_trees = 1000
        self.n_leaves = 10
        self.learning_rate = 0.1
        self.n_threshold = 256
        self.min_leaf_support = 1
        self.early_stop = 100
        self.ensemble = TreeEnsemble()
        super().__init__(**hp)

    # ---- gradient hook (MART overrides) ---------------------------------
    def _pseudo_responses(self, scorer, views, labels_flat, scores):
        lam, w = lambda_round(scorer, views, scores)
        return lam[:-1], w[:-1]

    def fit(self, train: Dataset, scorer: MetricScorer,
            validation: Dataset | None = None) -> None:
        feats, labels, qptr = flatten(train)
        N, F = feats.shape
        thresholds, _ = compute_thresholds(feats, self.n_threshold)
        B = thresholds.shape[1]
        binned = jnp.asarray(bin_features(feats, thresholds))
        views = make_bucket_views(train)
        labels_flat = jnp.asarray(labels)
        scores = jnp.zeros((N + 1,), jnp.float32)   # last slot = pad sentinel

        vviews = vfeats = None
        vscores = None
        if validation is not None:
            vfeats, _, _ = flatten(validation)
            vviews = make_bucket_views(validation)
            vscores = jnp.zeros((vfeats.shape[0] + 1,), jnp.float32)

        log("Training starts...")
        head = f"{'#iter':<8}| {scorer.name + '-T':<11}"
        if validation is not None:
            head += f"| {scorer.name + '-V':<11}"
        log(head)

        best_val = -np.inf
        best_round = -1
        M = 2 * self.n_leaves - 1
        for t in range(self.n_trees):
            lam, w = self._pseudo_responses(scorer, views, labels_flat, scores)
            arr = grow_tree(binned, lam, n_bins=B, n_leaves=self.n_leaves,
                            min_leaf_support=self.min_leaf_support)
            out = leaf_outputs(arr.node_of_doc, lam, w, M, self._NEWTON)
            scores = scores.at[:-1].add(
                self.learning_rate * out[arr.node_of_doc])

            tree = self._host_tree(arr, out, thresholds)
            self.ensemble.add(tree, self.learning_rate)

            m_train = _views_metric(scorer, views, scores, len(train.queries))
            line = f"{t + 1:<8}| {m_train:<11.4f}"
            if validation is not None:
                vscores = vscores.at[:-1].add(
                    self.learning_rate
                    * jnp.asarray(_eval_one_tree(tree, vfeats)))
                m_val = _views_metric(scorer, vviews, vscores,
                                      len(validation.queries))
                line += f"| {m_val:<11.4f}"
                if m_val > best_val:
                    best_val = m_val
                    best_round = t
                if self.early_stop > 0 and t - best_round >= self.early_stop:
                    log(line)
                    log(f"Early stop at round {t + 1} "
                        f"(no validation gain in {self.early_stop} rounds)")
                    break
            log(line)

        if validation is not None and best_round >= 0:
            # rollback to the best validation round (ref: LambdaMART learn()
            # post-loop ensemble truncation)
            self.ensemble.truncate(best_round + 1)

    def _host_tree(self, arr, out, thresholds) -> Tree:
        feature = np.asarray(arr.feature)
        sbin = np.asarray(arr.bin)
        is_leaf = np.asarray(arr.is_leaf)
        n = int(np.asarray(arr.n_nodes))
        internal = (~is_leaf) & (feature >= 0)
        thr = np.zeros(len(feature), np.float32)
        thr[internal] = thresholds[feature[internal], sbin[internal]]
        t = Tree(feature=np.maximum(feature, 0), threshold=thr,
                 left=np.asarray(arr.left), right=np.asarray(arr.right),
                 is_leaf=is_leaf, output=np.asarray(out))
        return _compact_tree(t, n)

    # ---- scoring ---------------------------------------------------------
    def eval_dataset(self, ds: Dataset):
        if not len(self.ensemble):
            raise RankLibError("Model not trained/loaded")
        max_fid = 1 + max(int(t.feature.max()) for t in self.ensemble.trees)
        feats, _, qptr = flatten(ds)
        if feats.shape[1] < max_fid:
            feats = np.pad(feats, ((0, 0), (0, max_fid - feats.shape[1])))
        flat = self.ensemble.eval_matrix(feats)
        return [flat[qptr[i]: qptr[i + 1]] for i in range(len(ds.queries))]

    # ---- serialization -----------------------------------------------------
    def model_str(self) -> str:
        return model_header(self.NAME, {
            "No. of trees": len(self.ensemble),
            "No. of leaves": self.n_leaves,
            "No. of threshold candidates": self.n_threshold,
            "Learning rate": self.learning_rate,
            "Stop early": self.early_stop,
        }) + "\n" + self.ensemble.to_text()

    def load_str(self, text: str) -> None:
        params, _ = parse_model_params(text)
        if "No. of leaves" in params:
            self.n_leaves = int(params["No. of leaves"])
        if "Learning rate" in params:
            self.learning_rate = float(params["Learning rate"])
        self.ensemble = TreeEnsemble.from_text(text)
        if "No. of trees" in params:
            self.n_trees = int(params["No. of trees"])


@register_ranker
class MART(LambdaMART):
    """Pointwise GBRT: pseudo-responses are plain residuals and leaf
    outputs are mean residuals (ref: learning/tree/MART.java:~15 —
    overrides computePseudoResponses and updateTreeOutput, inherits all
    tree machinery)."""

    NAME = "MART"
    _NEWTON = False

    def _pseudo_responses(self, scorer, views, labels_flat, scores):
        return labels_flat - scores[:-1], None


def _compact_tree(t: Tree, n_nodes: int) -> Tree:
    """Drop unused slots (growth may stop before filling 2·nLeaves−1)."""
    if n_nodes >= t.n_slots:
        return t
    return Tree(t.feature[:n_nodes], t.threshold[:n_nodes], t.left[:n_nodes],
                t.right[:n_nodes], t.is_leaf[:n_nodes], t.output[:n_nodes])


def _eval_one_tree(tree: Tree, X: np.ndarray) -> np.ndarray:
    """Score one tree on raw features — host traversal for the incremental
    validation pass (cheap: Nv × depth)."""
    node = np.zeros(X.shape[0], np.int32)
    for _ in range(tree.depth()):
        leaf = tree.is_leaf[node]
        f = tree.feature[node]
        go_left = X[np.arange(X.shape[0]), f] <= tree.threshold[node]
        nxt = np.where(go_left, tree.left[node], tree.right[node])
        node = np.where(leaf, node, nxt).astype(np.int32)
    return tree.output[node]
