"""Genotype symbol histograms.

Per-shard histograms of the 5 genotype codes; merged across the device
mesh with psum to drive global codebook construction (the collective
analog called for by BASELINE.json's north star — the reference has no
distributed layer at all, SURVEY.md §2 'Parallelism inventory').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N_SYMBOLS = 5


@jax.jit
def code_histogram(codes: jax.Array) -> jax.Array:
    """Count occurrences of each code in a (L, S) uint8 matrix -> (5,) int64-ish.

    One-hot + sum reduces on the MXU-friendly path; XLA lowers this to a
    single fused reduction.
    """
    one_hot = (codes[..., None] == jnp.arange(N_SYMBOLS, dtype=codes.dtype)).astype(
        jnp.int32
    )
    return one_hot.sum(axis=(0, 1))


@jax.jit
def masked_code_histogram(codes: jax.Array, n_samples: jax.Array) -> jax.Array:
    """Histogram over the first ``n_samples`` columns only (padding ignored)."""
    L, S_pad = codes.shape
    valid = jnp.arange(S_pad, dtype=jnp.int32)[None, :] < n_samples
    one_hot = (codes[..., None] == jnp.arange(N_SYMBOLS, dtype=codes.dtype)).astype(
        jnp.int32
    ) * valid[..., None]
    return one_hot.sum(axis=(0, 1))
