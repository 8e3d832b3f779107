"""Pure-numpy isolation forest (Liu/Ting/Zhou 2008) — used by O4 when
sklearn is absent from the environment.

Matches the algorithm (not sklearn's RNG stream): n_estimators random
isolation trees over bootstrap-free subsamples of max_samples points,
anomaly score s(x) = 2^(−E[h(x)]/c(n)), decision threshold at the
training scores' contamination quantile (sklearn's ``offset_`` is the
same construction).

Trees are stored as flat arrays (feature index irrelevant — the
reference fits per single column, so this is the 1-D case, but the code
is written d-dimensional) and evaluated VECTORIZED: one fancy-indexed
walk per depth level per tree, no per-row Python.
"""

from __future__ import annotations

import numpy as np


def _c(n: float) -> float:
    """Average unsuccessful-search path length in a BST of n nodes."""
    if n <= 1:
        return 0.0
    return 2.0 * (np.log(n - 1) + 0.5772156649) - 2.0 * (n - 1) / n


class IsolationTree:
    __slots__ = (
        "feature", "threshold", "left", "right", "leaf_depth_adj",
        "bounds", "leaf_path",
    )

    def __init__(self, X: np.ndarray, rng: np.random.RandomState, max_depth: int):
        # flat arrays; node 0 is the root. leaf nodes have feature == -1
        feats: list[int] = []
        thrs: list[float] = []
        lefts: list[int] = []
        rights: list[int] = []
        adjs: list[float] = []  # c(n_leaf) correction added at leaves

        def build(idx: np.ndarray, depth: int) -> int:
            node = len(feats)
            feats.append(-1)
            thrs.append(0.0)
            lefts.append(-1)
            rights.append(-1)
            adjs.append(0.0)
            n = len(idx)
            if depth >= max_depth or n <= 1:
                adjs[node] = _c(n)
                return node
            f = rng.randint(X.shape[1])
            col = X[idx, f]
            lo, hi = col.min(), col.max()
            if lo == hi:
                adjs[node] = _c(n)
                return node
            thr = rng.uniform(lo, hi)
            feats[node] = f
            thrs[node] = thr
            lefts[node] = build(idx[col < thr], depth + 1)
            rights[node] = build(idx[col >= thr], depth + 1)
            return node

        build(np.arange(len(X)), 0)
        self.feature = np.array(feats, dtype=np.int32)
        self.threshold = np.array(thrs, dtype=np.float64)
        self.left = np.array(lefts, dtype=np.int32)
        self.right = np.array(rights, dtype=np.int32)
        self.leaf_depth_adj = np.array(adjs, dtype=np.float64)
        # 1-D fast path: the tree's comparisons are a BST over one axis, so
        # its leaves partition the line into intervals whose boundaries are
        # the internal thresholds IN-ORDER (non-decreasing by construction).
        # Scoring then becomes one searchsorted per tree instead of a
        # level-by-level masked walk — same depths bit-for-bit, ~50x faster.
        self.bounds: np.ndarray | None = None
        self.leaf_path: np.ndarray | None = None
        if X.shape[1] == 1:
            bnds: list[float] = []
            leaf_d: list[float] = []
            stack: list[tuple[int, int, bool]] = [(0, 0, False)]
            while stack:
                node, d, visited = stack.pop()
                if self.feature[node] < 0:
                    leaf_d.append(d + self.leaf_depth_adj[node])
                    continue
                if visited:
                    bnds.append(self.threshold[node])
                    stack.append((self.right[node], d + 1, False))
                else:
                    stack.append((node, d, True))
                    stack.append((self.left[node], d + 1, False))
            self.bounds = np.array(bnds, dtype=np.float64)
            self.leaf_path = np.array(leaf_d, dtype=np.float64)

    def path_length(self, X: np.ndarray) -> np.ndarray:
        if self.bounds is not None and X.shape[1] == 1:
            # side='right' counts thresholds <= v, matching the walk's
            # "v < thr goes left / v >= thr goes right" at every node.
            return self.leaf_path[
                np.searchsorted(self.bounds, X[:, 0], side="right")
            ]
        node = np.zeros(len(X), dtype=np.int32)
        depth = np.zeros(len(X), dtype=np.float64)
        active = self.feature[node] >= 0
        while active.any():
            cur = node[active]
            f = self.feature[cur]
            goes_left = X[active, f] < self.threshold[cur]
            nxt = np.where(goes_left, self.left[cur], self.right[cur])
            node[active] = nxt
            depth[active] += 1.0
            active = self.feature[node] >= 0
        return depth + self.leaf_depth_adj[node]


class NumpyIsolationForest:
    """fit/score_samples/predict subset of the sklearn surface."""

    def __init__(
        self,
        n_estimators: int = 100,
        max_samples: int = 256,
        contamination: float = 0.1,
        random_state: int = 42,
    ):
        self.n_estimators = n_estimators
        self.max_samples = max_samples
        self.contamination = contamination
        self.random_state = random_state
        self.trees: list[IsolationTree] = []
        self.offset_: float = 0.0

    def fit(self, X: np.ndarray) -> "NumpyIsolationForest":
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X.reshape(-1, 1)
        rng = np.random.RandomState(self.random_state)
        n = min(self.max_samples, len(X))
        max_depth = int(np.ceil(np.log2(max(n, 2))))
        self.trees = []
        for _ in range(self.n_estimators):
            sub = X[rng.choice(len(X), size=n, replace=False)]
            self.trees.append(IsolationTree(sub, rng, max_depth))
        self._cn = _c(n)
        train_scores = self.score_samples(X)
        # threshold such that `contamination` of training points are below
        self.offset_ = float(np.percentile(train_scores, 100.0 * self.contamination))
        return self

    def score_samples(self, X: np.ndarray) -> np.ndarray:
        """Higher = more normal (sklearn convention: −anomaly score)."""
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X.reshape(-1, 1)
        # running accumulation — np.mean over a list of n_estimators
        # million-row arrays first STACKS them (asanyarray copies
        # trees x rows doubles; measured 36 s at 1M rows x 100 trees)
        depths = np.zeros(len(X), dtype=np.float64)
        for t in self.trees:
            depths += t.path_length(X)
        depths /= len(self.trees)
        return -np.power(2.0, -depths / self._cn)

    def predict(self, X: np.ndarray) -> np.ndarray:
        """-1 = outlier, 1 = inlier (sklearn convention)."""
        return np.where(self.score_samples(X) < self.offset_, -1, 1)
