"""Greedy geometric selection kernels: k-center greedy and max-coverage.

Parity targets:
* k-center greedy — reference active_selection/core_set.py:17-38
  (sklearn pairwise euclidean distances + argmax of min-distance, seeded by
  the already-labeled set). Here the whole loop runs on device as a
  ``lax.fori_loop`` over a resident distance state — no sklearn, no host
  round-trips.
* max-representative greedy (facility-location style max coverage) —
  reference active_selection/max_subset.py:17-39. The reference's O(K) inner
  Python loop per step is replaced by one vectorized argmin over all
  candidates; first-occurrence tie-breaking matches the reference's strict
  ``>`` update order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def pairwise_euclidean(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, D) x (M, D) -> (N, M) euclidean distances (MXU matmul + rsqrt)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    sq = (jnp.sum(a * a, axis=1)[:, None] + jnp.sum(b * b, axis=1)[None, :]
          - 2.0 * a @ b.T)
    return jnp.sqrt(jnp.maximum(sq, 0.0))


@partial(jax.jit, static_argnames=("selection_size",))
def kcenter_greedy(features: jnp.ndarray, seed_mask: jnp.ndarray,
                   selection_size: int) -> jnp.ndarray:
    """K-center greedy selection.

    features: (N, D); seed_mask: (N,) bool marking already-selected points.
    Returns (selection_size,) indices into features, in selection order.
    Matches core_set.py:17-38: min_distances initialized against the seed
    set, then argmax / update for each new center.
    """
    features = features.astype(jnp.float32)
    n = features.shape[0]
    sq_norms = jnp.sum(features * features, axis=1)

    def dist_to(idx):
        d2 = sq_norms + sq_norms[idx] - 2.0 * features @ features[idx]
        return jnp.sqrt(jnp.maximum(d2, 0.0))

    # Initial min distance to the seed set: one (N, N) MXU matmul, masked to
    # seed columns (inf elsewhere). Seeds end up at distance 0 and can never
    # be re-selected (the reference's assert, core_set.py:25).
    full = pairwise_euclidean(features, features)
    min_d = jnp.min(jnp.where(seed_mask[None, :], full, jnp.inf), axis=1)
    min_d = jnp.where(seed_mask, 0.0, min_d)

    def body(_, carry):
        min_d, picked, k = carry
        ind = jnp.argmax(min_d)
        min_d = jnp.minimum(min_d, dist_to(ind))
        picked = picked.at[k].set(ind)
        return min_d, picked, k + 1

    _, picked, _ = jax.lax.fori_loop(
        0, selection_size, body,
        (min_d, jnp.zeros((selection_size,), jnp.int32), 0))
    return picked


@partial(jax.jit, static_argnames=("selection_count",))
def max_representative(all_features: jnp.ndarray,
                       candidate_features: jnp.ndarray,
                       selection_count: int) -> jnp.ndarray:
    """Greedy max-coverage subset of candidates (max_subset.py:17-39).

    Each step picks the candidate minimizing the summed min-distance from
    every pool point to the selected set. Returns candidate indices in
    selection order.
    """
    dists = pairwise_euclidean(all_features, candidate_features)  # (M, K)
    m, k = dists.shape

    def body(_, carry):
        min_d, chosen_mask, picked, step = carry
        tmp = jnp.minimum(min_d[:, None], dists)          # (M, K)
        scores = jnp.sum(tmp, axis=0)                     # (K,)
        scores = jnp.where(chosen_mask, jnp.inf, scores)
        best = jnp.argmin(scores)                         # first occurrence
        min_d = tmp[:, best]
        chosen_mask = chosen_mask.at[best].set(True)
        picked = picked.at[step].set(best)
        return min_d, chosen_mask, picked, step + 1

    init = (jnp.full((m,), jnp.inf, jnp.float32),
            jnp.zeros((k,), bool),
            jnp.zeros((selection_count,), jnp.int32), 0)
    _, _, picked, _ = jax.lax.fori_loop(0, selection_count, body, init)
    return picked
