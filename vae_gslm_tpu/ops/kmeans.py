"""K-means on TPU: Lloyd iterations + nearest-centroid assignment.

Replaces faiss (``/root/reference/scripts/hubert_kmeans.py:6,68-81``:
``faiss.Kmeans(d=1024, k=200, niter=20)`` train + 1-NN search) with
MXU-native linear algebra:

  * assignment: argmin_k ‖x‖² + ‖c‖² − 2x·cᵀ — one (N,D)@(D,K) matmul;
  * update: one-hot segment-sum — (K,N)@(N,D) matmul;
  * the whole Lloyd iteration is a jitted ``lax.fori_loop``; empty
    clusters keep their previous centroid (faiss behaviour).

Data are processed in fixed-size chunks so arbitrarily large feature
sets stream through a static-shape program.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@partial(jax.jit, static_argnames=("k",))
def _assign_chunk(x: Array, centroids: Array, k: int) -> Array:
    x = x.astype(jnp.float32)
    c = centroids.astype(jnp.float32)
    x2 = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    c2 = jnp.sum(jnp.square(c), axis=-1)
    xc = jnp.matmul(x, c.T, preferred_element_type=jnp.float32)
    return jnp.argmin(x2 + c2 - 2.0 * xc, axis=-1).astype(jnp.int32)


def assign(x: np.ndarray, centroids: np.ndarray,
           chunk: int = 65536) -> np.ndarray:
    """Nearest-centroid labels for (N, D) data, chunked."""
    k = centroids.shape[0]
    out = []
    for i in range(0, len(x), chunk):
        out.append(np.asarray(_assign_chunk(
            jnp.asarray(x[i: i + chunk]), jnp.asarray(centroids), k)))
    return np.concatenate(out) if out else np.zeros((0,), np.int32)


@partial(jax.jit, static_argnames=("k", "niter"))
def _lloyd(x: Array, init_centroids: Array, k: int, niter: int
           ) -> Tuple[Array, Array]:
    x = x.astype(jnp.float32)

    def body(_, centroids):
        labels = _assign_chunk(x, centroids, k)
        onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)  # (N, K)
        counts = onehot.sum(0)                                  # (K,)
        sums = jnp.matmul(onehot.T, x,
                          preferred_element_type=jnp.float32)   # (K, D)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        # Empty clusters keep their old centroid.
        return jnp.where(counts[:, None] > 0, new, centroids)

    centroids = jax.lax.fori_loop(0, niter, body, init_centroids)
    labels = _assign_chunk(x, centroids, k)
    return centroids, labels


class KMeans:
    """Drop-in for ``faiss.Kmeans(d, k, niter)``: ``train`` then
    ``centroids`` / ``index``-style assignment via :func:`assign`."""

    def __init__(self, d: int, k: int, niter: int = 20,
                 seed: int = 1234):
        self.d, self.k, self.niter, self.seed = d, k, niter, seed
        self.centroids: Optional[np.ndarray] = None

    def _kmeanspp_init(self, x: np.ndarray,
                       rng: np.random.RandomState) -> np.ndarray:
        """k-means++ seeding (distance-weighted), computed on device."""
        n = len(x)
        centroids = [x[rng.randint(n)]]
        d2 = np.sum((x - centroids[0]) ** 2, axis=-1)
        for _ in range(1, self.k):
            probs = d2 / max(d2.sum(), 1e-12)
            idx = rng.choice(n, p=probs)
            centroids.append(x[idx])
            d2 = np.minimum(d2, np.sum((x - x[idx]) ** 2, axis=-1))
        return np.stack(centroids)

    def train(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float32)
        assert x.shape[1] == self.d
        rng = np.random.RandomState(self.seed)
        init = self._kmeanspp_init(x, rng)
        centroids, _ = _lloyd(jnp.asarray(x), jnp.asarray(init),
                              self.k, self.niter)
        self.centroids = np.asarray(centroids)
        return self.centroids

    def search(self, x: np.ndarray) -> np.ndarray:
        assert self.centroids is not None, "train() or load first"
        return assign(x, self.centroids)

    def save(self, path: str) -> None:
        np.save(path, self.centroids)

    @classmethod
    def load(cls, path: str, niter: int = 20) -> "KMeans":
        centroids = np.load(path)
        km = cls(centroids.shape[1], centroids.shape[0], niter)
        km.centroids = centroids.astype(np.float32)
        return km


def inertia(x: np.ndarray, centroids: np.ndarray) -> float:
    labels = assign(x, centroids)
    return float(np.sum((x - centroids[labels]) ** 2))
