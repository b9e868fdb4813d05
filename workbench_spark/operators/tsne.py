"""Exact t-SNE in pure numpy — the C7 sampled-projection parity path.

The reference's 2D projections (``utils/chem_utils/projections.py:18-219``,
``algorithms/dataframe/projection_2d.py:17-135``) run UMAP/TSNE
driver-side via sklearn/umap-learn on a (sampled) pandas frame — the
projection is for dashboard PLOTS, not a distributed transform. Neither
library is in this container, so this module implements exact t-SNE (van
der Maaten & Hinton, JMLR 2008) directly on numpy:

- per-point conditional P via binary-searched Gaussian bandwidth to a
  target perplexity;
- symmetrized + early-exaggerated P;
- gradient descent with momentum on the Student-t low-dim affinities;
- PCA initialization (deterministic, and the sklearn-recommended init).

O(n²) memory/time — callers cap the sample (projection_2d's
``sample_cap``); at the 2k-point dashboard scale a run is a few seconds.
Deterministic for a fixed seed.
"""

from __future__ import annotations

import numpy as np


def _pairwise_sq_dists(X: np.ndarray) -> np.ndarray:
    s = (X * X).sum(axis=1)
    d2 = s[:, None] + s[None, :] - 2.0 * (X @ X.T)
    np.fill_diagonal(d2, 0.0)
    return np.maximum(d2, 0.0)


def _p_conditional(d2: np.ndarray, perplexity: float, tol: float = 1e-5) -> np.ndarray:
    """Row-stochastic P[i|j] with per-row beta found by binary search so
    that the row entropy matches log(perplexity)."""
    n = d2.shape[0]
    target = np.log(perplexity)
    P = np.zeros_like(d2)
    for i in range(n):
        beta_lo, beta_hi, beta = 0.0, np.inf, 1.0
        di = np.delete(d2[i], i)
        for _ in range(64):
            w = np.exp(-di * beta)
            sw = w.sum()
            if sw <= 0:
                h = 0.0
                p = np.zeros_like(w)
            else:
                p = w / sw
                h = -(p[p > 0] * np.log(p[p > 0])).sum()
            if abs(h - target) < tol:
                break
            if h > target:  # entropy too high -> sharpen (raise beta)
                beta_lo = beta
                beta = beta * 2 if beta_hi == np.inf else (beta + beta_hi) / 2
            else:
                beta_hi = beta
                beta = beta / 2 if beta_lo == 0.0 else (beta + beta_lo) / 2
        P[i, np.arange(n) != i] = p
    return P


def tsne_embed(
    X: np.ndarray,
    perplexity: float = 30.0,
    n_iter: int = 500,
    learning_rate: float | None = None,
    seed: int = 42,
    early_exaggeration: float = 12.0,
) -> np.ndarray:
    """Exact t-SNE to 2D. Returns (n, 2). Deterministic per seed."""
    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]
    if n == 0:
        return np.zeros((0, 2))
    if n == 1:
        return np.zeros((1, 2))
    perplexity = min(perplexity, max((n - 1) / 3.0, 2.0))
    d2 = _pairwise_sq_dists(X)
    P = _p_conditional(d2, perplexity)
    P = (P + P.T) / (2.0 * n)
    P = np.maximum(P, 1e-12)

    # PCA init (scaled to std 1e-4 as in the reference implementation)
    Xc = X - X.mean(axis=0)
    # SVD is deterministic up to sign; fix signs by largest-abs convention
    _, _, vt = np.linalg.svd(Xc, full_matrices=False)
    signs = np.sign(vt[np.arange(min(2, vt.shape[0])),
                       np.argmax(np.abs(vt[: min(2, vt.shape[0])]), axis=1)])
    comps = vt[:2] * signs[:, None]
    Y = Xc @ comps.T
    if Y.shape[1] < 2:
        Y = np.hstack([Y, np.zeros((n, 1))])
    std = Y.std(axis=0)
    std[std == 0] = 1.0
    rng = np.random.default_rng(seed)
    Y = Y / std * 1e-4 + rng.normal(0, 1e-6, size=(n, 2))

    if learning_rate is None:
        # sklearn's 'auto' heuristic (Belkina 2019): stable across n
        learning_rate = max(n / early_exaggeration / 4.0, 50.0)
    vel = np.zeros_like(Y)
    gains = np.ones_like(Y)  # per-coordinate adaptive gains (van der Maaten)
    exag_iters = min(250, n_iter // 2)
    for it in range(n_iter):
        Pe = P * early_exaggeration if it < exag_iters else P
        momentum = 0.5 if it < exag_iters else 0.8
        dy2 = _pairwise_sq_dists(Y)
        num = 1.0 / (1.0 + dy2)
        np.fill_diagonal(num, 0.0)
        Q = num / num.sum()
        Q = np.maximum(Q, 1e-12)
        PQ = (Pe - Q) * num
        grad = 4.0 * ((np.diag(PQ.sum(axis=1)) - PQ) @ Y)
        gains = np.where(np.sign(grad) != np.sign(vel), gains + 0.2, gains * 0.8)
        gains = np.maximum(gains, 0.01)
        vel = momentum * vel - learning_rate * gains * grad
        Y = Y + vel
        Y = Y - Y.mean(axis=0)
    return Y


def tsne_kl_divergence(X: np.ndarray, Y: np.ndarray, perplexity: float = 30.0) -> float:
    """KL(P||Q) of an embedding — the t-SNE objective, for quality
    assertions in tests."""
    n = X.shape[0]
    perplexity = min(perplexity, max((n - 1) / 3.0, 2.0))
    P = _p_conditional(_pairwise_sq_dists(np.asarray(X, float)), perplexity)
    P = np.maximum((P + P.T) / (2.0 * n), 1e-12)
    num = 1.0 / (1.0 + _pairwise_sq_dists(np.asarray(Y, float)))
    np.fill_diagonal(num, 0.0)
    Q = np.maximum(num / num.sum(), 1e-12)
    return float((P * np.log(P / Q)).sum())
