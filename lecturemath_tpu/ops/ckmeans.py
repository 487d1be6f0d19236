"""Convolutional (spherical) K-means for image-patch features, as a jitted
lax.scan over update steps.

Semantics match the reference ConvolutionalKMeans (reference:
AccessMath/util/ckmean.py:18-150): cosine-similarity assignment, centers
updated as similarity-weighted means and re-normalized; convergence measured
by the mean dot product between old and new centers. Here assignment +
update are two matmuls on the MXU instead of a Python loop over clusters.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _normalize_rows(mat: jnp.ndarray) -> jnp.ndarray:
    norms = jnp.linalg.norm(mat, axis=1, keepdims=True)
    return jnp.where(norms > 0.0, mat / norms, mat)


@partial(jax.jit, static_argnames=("k",))
def _update(centers: jnp.ndarray, data: jnp.ndarray, data_norms: jnp.ndarray,
            k: int):
    cos_sim = (data @ centers.T) / (data_norms[:, None] *
                                    jnp.linalg.norm(centers, axis=1)[None, :])
    best = jnp.argmax(cos_sim, axis=1)
    best_sim = jnp.max(cos_sim, axis=1)

    one_hot = jax.nn.one_hot(best, k, dtype=data.dtype)       # [N, K]
    weights = one_hot * best_sim[:, None]                     # similarity-weighted
    weighted_sums = weights.T @ data                          # [K, D]
    total_weights = weights.sum(axis=0)                       # [K]

    updated = jnp.where(total_weights[:, None] > 0.0,
                        weighted_sums / jnp.maximum(total_weights, 1e-12)[:, None],
                        centers)
    updated = _normalize_rows(updated)
    similarity = jnp.sum(centers * updated, axis=1).mean()
    return updated, similarity


class ConvolutionalKMeans:
    def __init__(self, data: np.ndarray, k: int, seed: int = 0,
                 init_vectors: np.ndarray = None, verbose: bool = False):
        data = np.asarray(data)
        if data.dtype not in (np.float32, np.float64):
            raise TypeError("K-means data must be floating point")
        self.data = jnp.asarray(data, jnp.float32)
        self.k = k
        self.verbose = verbose
        self._data_norms = jnp.linalg.norm(self.data, axis=1)

        if init_vectors is None:
            rng = np.random.default_rng(seed)
            rows = rng.choice(len(data), size=k, replace=False)
            init_vectors = data[rows]
        elif len(init_vectors) < k:
            raise ValueError("not enough init vectors for selected K")
        else:
            rng = np.random.default_rng(seed)
            rows = rng.choice(len(init_vectors), size=k, replace=False)
            init_vectors = np.asarray(init_vectors)[rows]

        self.centers = _normalize_rows(jnp.asarray(init_vectors, jnp.float32))

    def update(self) -> float:
        self.centers, similarity = _update(self.centers, self.data,
                                           self._data_norms, self.k)
        return float(similarity)

    def execute(self, max_iterations: int = 1000,
                min_similarity: float = 1.0) -> Tuple[int, float]:
        similarity = 0.0
        iterations = 0
        while iterations < max_iterations and similarity < min_similarity:
            similarity = self.update()
            iterations += 1
            if self.verbose:
                print(f"it {iterations}, mean similarity: {similarity:.10f}")
        return iterations, similarity

    def assign(self, data: np.ndarray) -> np.ndarray:
        data = jnp.asarray(data, jnp.float32)
        cos_sim = (data @ self.centers.T) / (
            jnp.linalg.norm(data, axis=1, keepdims=True) *
            jnp.linalg.norm(self.centers, axis=1)[None, :])
        return np.asarray(jnp.argmax(cos_sim, axis=1))
