"""k-mer hashing and dense counting — device-first.

Replaces the reference's pure-Python hot loops (SURVEY.md §3.1):
  * HashSeq.py:74-117      — per-read k-mer integer hashing (k=12, joblib)
  * count_kmer_v1.py:32-146 — per-haplotype Counter-of-kmers map/reduce

Design: 2-bit codes → rolling 2k-bit integer hashes as a sum of k shifted
code vectors (static unroll over k), then dense 4^k count tables via
scatter-add.  k=12 → 4^12 = 16.7M int32 = 67MB, comfortably HBM-resident;
per-haplotype tables live on device and the 4-way overlap vote of the
read-partition stage (get_raw_kmer_overlap_count_unphased_est_pbs_v1.py)
becomes pure gathers + segment sums.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pack import CODE_N


def kmer_hashes_np(codes: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Host/numpy rolling k-mer hashes.

    codes: (L,) int8.  Returns (hashes (L-k+1,) int64, valid (L-k+1,) bool)
    where valid marks windows free of N."""
    L = len(codes)
    n = L - k + 1
    if n <= 0:
        return np.zeros(0, np.int64), np.zeros(0, bool)
    c = codes.astype(np.int64)
    h = np.zeros(n, np.int64)
    bad = np.zeros(n, bool)
    for j in range(k):
        cj = c[j : j + n]
        h = (h << 2) | (cj & 3)
        bad |= cj == CODE_N
    return h, ~bad


@functools.partial(jax.jit, static_argnames=("k",))
def kmer_hashes(codes: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched device rolling k-mer hashes.

    codes: (B, L) int8 (padded with CODE_N).  Returns
    (hashes (B, L-k+1) int32 for k<=15, valid (B, L-k+1) bool)."""
    B, L = codes.shape
    n = L - k + 1
    c = codes.astype(jnp.int32)
    h = jnp.zeros((B, n), jnp.int32)
    bad = jnp.zeros((B, n), bool)
    for j in range(k):
        cj = jax.lax.dynamic_slice(c, (0, j), (B, n))
        h = (h << 2) | (cj & 3)
        bad = bad | (cj == CODE_N)
    return h, ~bad


@functools.partial(jax.jit, static_argnames=("k",))
def canonical_hashes(hashes: jnp.ndarray, k: int) -> jnp.ndarray:
    """min(h, revcomp(h)) — strand-canonical k-mer hash."""
    h = hashes.astype(jnp.uint32)
    # complement: code ^ 3 for every 2-bit field
    mask = jnp.uint32((1 << (2 * k)) - 1)
    comp = h ^ mask
    # reverse the k 2-bit fields
    rc = jnp.zeros_like(h)
    for _ in range(k):
        rc = (rc << 2) | (comp & 3)
        comp = comp >> 2
    return jnp.minimum(h, rc).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def count_kmers_dense(hashes: jnp.ndarray, valid: jnp.ndarray, k: int) -> jnp.ndarray:
    """Dense 4^k k-mer count table via scatter-add.

    hashes/valid: (B, n).  Returns (4^k,) int32 counts."""
    flat = hashes.reshape(-1)
    w = valid.reshape(-1).astype(jnp.int32)
    table = jnp.zeros(4**k, jnp.int32)
    return table.at[flat].add(w, mode="drop")


@jax.jit
def unique_mask(tables: jnp.ndarray) -> jnp.ndarray:
    """tables: (H, 4^k) counts for H haplotype DBs.  A k-mer is 'unique' to
    hap h if present in h and absent from all others
    (ref: get_unique_kmer at get_raw_kmer_overlap_count…py:57-71).
    Returns (H, 4^k) bool."""
    present = tables > 0
    n_present = jnp.sum(present, axis=0, keepdims=True)
    return present & (n_present == 1)


@jax.jit
def distinct_runs(hashes: jnp.ndarray, valid: jnp.ndarray):
    """Per-row distinct k-mer view: sort each row, mark first occurrences,
    compute multiplicities — the device replacement for the reference's
    per-read `Counter` (get_raw_kmer_overlap…py count_overlap:43-49).

    hashes/valid: (B, n).  Returns (sorted_h (B,n) int32 with invalid rows
    pushed to the end as 2^30, first (B,n) bool, runlen (B,n) int32)."""
    big = jnp.int32(1 << 30)
    h = jnp.where(valid, hashes, big)
    s = jnp.sort(h, axis=1)
    first = jnp.concatenate(
        [jnp.ones((h.shape[0], 1), bool), s[:, 1:] != s[:, :-1]], axis=1)
    first = first & (s != big)
    # run length of each first occurrence = next boundary - index
    n = h.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    # boundary index of the *next* first occurrence (or n)
    nxt = jnp.where(first, idx, n + 1)
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(
        jnp.concatenate([nxt[:, 1:], jnp.full((h.shape[0], 1), n, jnp.int32)],
                        axis=1), axis=1), axis=1), axis=1)
    # count of valid entries per row caps the final run
    nvalid = jnp.sum(valid, axis=1, keepdims=True)
    runlen = jnp.clip(jnp.minimum(nxt, nvalid) - idx, 0, None)
    return s, first, runlen


@jax.jit
def overlap_scores(sorted_h: jnp.ndarray, first: jnp.ndarray,
                   runlen: jnp.ndarray, tables: jnp.ndarray,
                   unique: jnp.ndarray) -> jnp.ndarray:
    """4-way (or H-way) unique-k-mer overlap vote.

    score[b, j] = Σ_{distinct k of read b present & unique in table j}
                  (R_b[k] + table_j[k])   — get_raw_kmer_overlap…py:43-49.

    tables: (H, 4^k) counts; unique: (H, 4^k) bool.  Returns (B, H)."""
    g = jnp.clip(sorted_h, 0, tables.shape[1] - 1)
    t = tables[:, g]                     # (H, B, n)
    u = unique[:, g]                     # (H, B, n)
    w = (first & (runlen > 0))[None, :, :]
    contrib = jnp.where(u & w, runlen[None, :, :] + t, 0)
    return jnp.sum(contrib, axis=2).T.astype(jnp.int32)


def count_kmers_dense_np(codes_list, k: int) -> np.ndarray:
    """Host fallback for small inputs."""
    table = np.zeros(4**k, np.int64)
    for codes in codes_list:
        h, v = kmer_hashes_np(np.asarray(codes), k)
        np.add.at(table, h[v], 1)
    return table
