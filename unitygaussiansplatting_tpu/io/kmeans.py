"""Mini-batch k-means for SH palette clustering, TPU-native.

Replaces the reference's heaviest CPU compute: the AVX/NEON mini-batch
k-means used for Cluster* SH formats
(package/Editor/Utils/KMeansClustering.cs:15-208, Sculley 2010;
3-10 minutes for 6M splats on CPU per GaussianSplatAssetCreator.cs:160).

TPU formulation: the distance computation is
``|x|^2 + |c|^2 - 2 x @ c^T`` — a (B, D) x (D, K) matmul on the MXU, chunked
over K to bound the (B, K) distance matrix in HBM.  A full 6M x 64k
assignment is ~24 TFLOP of matmul, i.e. seconds on one chip instead of
minutes on CPU.  Mini-batch updates use per-cluster counts as learning rates
(same schedule as the reference / Sculley).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _chunked_argmin_dist(x: jnp.ndarray, centers: jnp.ndarray, k_chunk: int):
    """Nearest center for each row of x; distances chunked over centers.

    x: (B, D), centers: (K, D) with K % k_chunk == 0.
    Returns (best_idx (B,), best_dist (B,)).
    """
    b = x.shape[0]
    k = centers.shape[0]
    x_sq = jnp.sum(x * x, axis=-1, keepdims=True)  # (B, 1)
    num_chunks = k // k_chunk
    c_chunks = centers.reshape(num_chunks, k_chunk, -1)

    def body(carry, ci):
        best_d, best_i, base = carry
        c = ci
        c_sq = jnp.sum(c * c, axis=-1)  # (k_chunk,)
        # -2 x c^T on the MXU; keep f32 accumulation.
        cross = jnp.dot(x, c.T, preferred_element_type=jnp.float32)
        d = x_sq + c_sq[None, :] - 2.0 * cross  # (B, k_chunk)
        idx = jnp.argmin(d, axis=-1)
        dmin = jnp.take_along_axis(d, idx[:, None], axis=-1)[:, 0]
        upd = dmin < best_d
        best_d = jnp.where(upd, dmin, best_d)
        best_i = jnp.where(upd, base + idx.astype(jnp.int32), best_i)
        return (best_d, best_i, base + k_chunk), None

    init = (
        jnp.full((b,), jnp.inf, jnp.float32),
        jnp.zeros((b,), jnp.int32),
        jnp.int32(0),
    )
    (best_d, best_i, _), _ = jax.lax.scan(body, init, c_chunks)
    return best_i, best_d


@functools.partial(
    jax.jit, static_argnames=("k", "iters", "batch", "k_chunk", "init_attempts")
)
def fit_kmeans(
    data: jnp.ndarray,
    key: jnp.ndarray,
    k: int,
    iters: int = 256,
    batch: int = 8192,
    k_chunk: int = 4096,
    init_attempts: int = 3,
) -> jnp.ndarray:
    """Mini-batch k-means; returns (k, D) centers.

    Like the reference, initialization draws ``init_attempts`` candidate
    seedings and keeps the lowest-cost one (KMeansClustering.cs:508-570 runs
    3 k-means++ attempts); the per-attempt seeding here is random-sample
    scored on a probe batch — the TPU-friendly substitute for sequential
    k-means++, which cannot vectorize at k=64k.  k need not be a multiple
    of k_chunk: centers are padded with +inf sentinel rows that can never
    win an argmin.
    """
    n, d = data.shape
    k_chunk = min(k_chunk, k)
    kpad = -(-k // k_chunk) * k_chunk

    key_init, key_probe, key_iter = jax.random.split(key, 3)
    probe = data[jax.random.randint(key_probe, (min(4096, n),), 0, n)]

    def one_attempt(ak):
        idx = jax.random.choice(ak, n, shape=(k,), replace=n < k)
        cand = data[idx]
        cand = jnp.pad(cand, ((0, kpad - k), (0, 0)), constant_values=1e17)
        _, dmin = _chunked_argmin_dist(probe, cand, k_chunk)
        return cand, jnp.sum(dmin)

    cands, costs = jax.lax.map(one_attempt, jax.random.split(key_init, init_attempts))
    centers = cands[jnp.argmin(costs)]
    counts = jnp.ones((kpad,), jnp.float32)

    def step(carry, it_key):
        centers, counts = carry
        idx = jax.random.randint(it_key, (batch,), 0, n)
        x = data[idx]
        assign, _ = _chunked_argmin_dist(x, centers, k_chunk)
        # Per-center batch sums / counts.
        ones = jnp.ones((batch,), jnp.float32)
        batch_counts = jax.ops.segment_sum(ones, assign, num_segments=kpad)
        batch_sums = jax.ops.segment_sum(x, assign, num_segments=kpad)
        new_counts = counts + batch_counts
        # Sculley update: c += (1/count) * (x - c) per sample, batched form.
        lr = jnp.where(batch_counts > 0, batch_counts / new_counts, 0.0)[:, None]
        target = jnp.where(
            batch_counts[:, None] > 0, batch_sums / jnp.maximum(batch_counts[:, None], 1), centers
        )
        centers = centers + lr * (target - centers)
        return (centers, new_counts), None

    keys = jax.random.split(key_iter, iters)
    (centers, _), _ = jax.lax.scan(step, (centers, counts), keys)
    return centers[:k]


@functools.partial(jax.jit, static_argnames=("k_chunk", "n_chunk"))
def assign_clusters(
    data: jnp.ndarray, centers: jnp.ndarray, k_chunk: int = 4096, n_chunk: int = 65536
) -> jnp.ndarray:
    """Nearest-center index for every row of data; (N,) int32."""
    n, d = data.shape
    pad = (-n) % n_chunk
    padded = jnp.pad(data, ((0, pad), (0, 0)))
    batches = padded.reshape(-1, n_chunk, d)

    k = centers.shape[0]
    kc = min(k_chunk, k)
    kpad = -(-k // kc) * kc
    centers_p = jnp.pad(centers, ((0, kpad - k), (0, 0)), constant_values=1e17)

    def body(_, x):
        idx, _ = _chunked_argmin_dist(x, centers_p, kc)
        return None, idx

    _, idxs = jax.lax.scan(body, None, batches)
    return idxs.reshape(-1)[:n]


def cluster_sh(
    sh: jnp.ndarray, k: int, seed: int = 0, iters: int = 512, batch: int = 8192
):
    """Cluster (N, 15, 3) SH coefficients into a k-entry palette.

    Returns (table (k, 15, 3) f32, indices (N,) int32) — the inputs the asset
    encoder stores for Cluster* formats (GaussianSplatAssetCreator.cs:476-518).
    """
    n = sh.shape[0]
    flat = jnp.asarray(sh, jnp.float32).reshape(n, 45)
    key = jax.random.PRNGKey(seed)
    k_chunk = min(4096, k)
    centers = fit_kmeans(flat, key, k=k, iters=iters, batch=batch, k_chunk=k_chunk)
    idx = assign_clusters(flat, centers, k_chunk=k_chunk)
    return centers.reshape(k, 15, 3), idx
