"""Static-shape token selection for the Snuffy sparse attention pattern.

The reference picks, per encoder layer, the top ⌈Λ·(1−ρ)⌉ tokens by instance
logit plus ⌊Λ·ρ⌋ tokens sampled uniformly *without replacement* from the
remainder (reference snuffy.py:126-155), using a host-side
`np.random.choice` that breaks any accelerator pipeline. Here both shares are
computed on-device with static shapes:

- top share: `lax.top_k` over mask-guarded logits;
- random share: Gumbel-top-k over the remainder mask, which is exactly
  uniform sampling without replacement and stays inside `jit`.

Bags are padded to bucket lengths; every selection returns a per-slot
validity mask so downstream attention/scatter can ignore dead slots. Slot
validity reproduces the reference's dynamic sizing rules:
`k_top_eff = min(k_top, n_valid)` and
`k_rand_eff = min(k_rand, n_valid − k_top_eff)` (snuffy.py:136-143).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Selection(NamedTuple):
    """Indices of selected tokens plus per-slot validity.

    indices: (S,) int32 — token positions in the padded bag. Invalid slots
        hold an arbitrary (masked) position; consumers must route them
        through `slot_valid`.
    slot_valid: (S,) bool.
    """

    indices: jnp.ndarray
    slot_valid: jnp.ndarray


def _padded_top_k(guarded: jnp.ndarray, k: int) -> Selection:
    """top_k clamped to the array length; surplus slots (bucket shorter than
    k — the reference's dynamic `min(k, n)` sizing, snuffy.py:136-143) come
    back as invalid so the static slot count S stays shape-stable."""
    k_eff = min(k, guarded.shape[0])
    vals, idx = jax.lax.top_k(guarded, k_eff)
    idx = idx.astype(jnp.int32)
    valid = jnp.isfinite(vals)
    if k_eff < k:
        idx = jnp.pad(idx, (0, k - k_eff))
        valid = jnp.pad(valid, (0, k - k_eff))
    return Selection(idx, valid)


def top_share_selection(scores: jnp.ndarray, valid: jnp.ndarray, k: int) -> Selection:
    """Top-k token positions by score among valid tokens.

    scores: (N,) float; valid: (N,) bool. Matches a descending stable sort's
    first-k slice (reference snuffy.py:128-131): `lax.top_k` breaks ties by
    lowest index, as torch.sort(descending=True, stable) does.
    """
    guarded = jnp.where(valid, scores.astype(jnp.float32), -jnp.inf)
    return _padded_top_k(guarded, k)


def gumbel_without_replacement(
    key: jax.Array, allowed: jnp.ndarray, k: int
) -> Selection:
    """Sample k positions uniformly without replacement from `allowed`.

    Gumbel-top-k: adding i.i.d. Gumbel noise to equal logits and taking the
    top-k is distributionally identical to sequential uniform draws without
    replacement — the jit-safe equivalent of `np.random.choice(...,
    replace=False)` (reference snuffy.py:141-143).
    """
    g = jax.random.gumbel(key, allowed.shape, dtype=jnp.float32)
    guarded = jnp.where(allowed, g, -jnp.inf)
    return _padded_top_k(guarded, k)


class PreparedSelection(NamedTuple):
    """Depth-invariant part of the Λ pattern: the reference re-sorts the SAME
    instance logits at every layer (snuffy.py:128 — `c` never changes), so
    the top share and the eligible-remainder pool hoist out of the layer
    loop; only the random share is drawn per layer."""

    top: Selection
    remainder: jnp.ndarray         # (N,) bool — valid ∧ ¬top
    ref_dim: jnp.ndarray | None    # multiclass only


def binary_selection_prepare(
    instance_logits: jnp.ndarray, valid: jnp.ndarray, k_top: int
) -> PreparedSelection:
    top = top_share_selection(instance_logits, valid, k_top)
    # Invalid top slots index padded (already-False) positions, so
    # unconditional clearing is safe.
    remainder = valid.at[top.indices].set(False)
    return PreparedSelection(top, remainder, None)


def binary_selection_draw(
    key: jax.Array, prep: PreparedSelection, k_rand: int
) -> Selection:
    if k_rand == 0:
        return prep.top
    rand = gumbel_without_replacement(key, prep.remainder, k_rand)
    return Selection(
        jnp.concatenate([prep.top.indices, rand.indices]),
        jnp.concatenate([prep.top.slot_valid, rand.slot_valid]),
    )


def binary_lambda_selection(
    key: jax.Array,
    instance_logits: jnp.ndarray,  # (N,) — single-class logits
    valid: jnp.ndarray,            # (N,) bool
    k_top: int,
    k_rand: int,
) -> Selection:
    """The binary-Snuffy Λ pattern: top share then uniform random share.

    Returns S = k_top + k_rand slots. Semantics of reference
    snuffy.py:126-153 under padding:
      - if n_valid < k_top, surplus top slots are invalid;
      - the random share draws from valid ∧ ¬top, capped implicitly at the
        remainder size via slot validity (matches snuffy.py:137-140).
    """
    return binary_selection_draw(
        key, binary_selection_prepare(instance_logits, valid, k_top), k_rand
    )


def _unique_ascending(flat_idx: jnp.ndarray, flat_valid: jnp.ndarray, n: int):
    """Deduplicate `flat_idx` (values in [0, n)), keeping ascending order.

    Returns (compacted (len,) int32 with unique values first, count r).
    jit-safe replacement for torch.unique (reference
    snuffy_multiclass.py:139-141), which also returns ascending values.
    """
    sentinel = jnp.int32(n)
    guarded = jnp.where(flat_valid, flat_idx.astype(jnp.int32), sentinel)
    s = jnp.sort(guarded)
    first = jnp.concatenate([jnp.array([True]), s[1:] != s[:-1]])
    is_unique = first & (s < sentinel)
    r = jnp.sum(is_unique)
    # Stable-compact unique entries to the front, preserving ascending order.
    order = jnp.argsort(~is_unique, stable=True)
    return s[order], r


def multiclass_selection_prepare(
    instance_logits: jnp.ndarray, valid: jnp.ndarray, k_top: int
) -> PreparedSelection:
    """Hoisted multiclass top share: per-class top-k → unique → ref_dim and
    the complement pool (reference snuffy_multiclass.py:133-149; like the
    binary case, `c` is layer-invariant)."""
    n, c = instance_logits.shape
    s_half = min(k_top * c, n)

    def per_class(cl):
        return top_share_selection(instance_logits[:, cl], valid, min(k_top, n))

    sels = [per_class(cl) for cl in range(c)]
    flat_idx = jnp.concatenate([s.indices for s in sels])
    flat_val = jnp.concatenate([s.slot_valid for s in sels])

    uniq, r = _unique_ascending(flat_idx, flat_val, n)
    n_valid = jnp.sum(valid).astype(jnp.int32)
    ref_dim = jnp.maximum(jnp.minimum(r, n_valid - r).astype(jnp.int32), 0)

    slot_ids = jnp.arange(s_half, dtype=jnp.int32)
    top = Selection(uniq[:s_half], slot_ids < ref_dim)
    remainder = valid.at[jnp.where(flat_val, flat_idx, jnp.int32(n))].set(
        False, mode="drop"
    )
    return PreparedSelection(top, remainder, ref_dim)


def multiclass_selection_draw(
    key: jax.Array, prep: PreparedSelection
) -> Selection:
    s_half = prep.top.indices.shape[0]
    slot_ids = jnp.arange(s_half, dtype=jnp.int32)
    rand = gumbel_without_replacement(key, prep.remainder, s_half)
    rand_valid = (slot_ids < prep.ref_dim) & rand.slot_valid
    return Selection(
        jnp.concatenate([prep.top.indices, rand.indices]),
        jnp.concatenate([prep.top.slot_valid, rand_valid]),
    )


# ------------------------------------------------------------ packed bags
#
# Batched-bags training can fold B equal-length bags along the row axis
# into ONE (B*N, d) program: the MIL GEMM shapes are M-bound (ROOFLINE.md
# §1 — d→d at M=10240 runs at ~14-28% peak vs ~60-80% at larger M), so
# running them at M=B*N is the "different arithmetic" §3 calls for, and it
# sidesteps the closed vmap-backward-schedule penalty (ROUND3.md) because
# the graph stays unbatched. Selection stays per-bag: prepare/draw are
# vmapped over the segment axis, then indices are offset into packed
# (row-axis) coordinates.


def packed_selection_prepare(
    instance_logits: jnp.ndarray,  # (k, N) binary — or (k, N, C) multiclass
    valid: jnp.ndarray,            # (k, N) bool
    k_top: int,
    multiclass: bool = False,
) -> PreparedSelection:
    """Per-segment hoisted top share; every leaf gains a leading (k,) axis.

    Indices stay in per-segment coordinates — `packed_selection_draw`
    converts to packed row coordinates.
    """
    if multiclass:
        return jax.vmap(
            lambda c, m: multiclass_selection_prepare(c, m, k_top)
        )(instance_logits, valid)
    return jax.vmap(
        lambda c, m: binary_selection_prepare(c, m, k_top)
    )(instance_logits, valid)


def packed_selection_draw(
    key: jax.Array,
    prep: PreparedSelection,  # batched (leading k axis)
    k_rand: int,
    seg_len: int,
    multiclass: bool = False,
) -> Selection:
    """Draw each segment's random share independently and return ONE flat
    Selection in packed row coordinates: indices (k*S,) with segment s's
    slots occupying [s*S, (s+1)*S) and pointing into rows
    [s*seg_len, (s+1)*seg_len)."""
    k = prep.top.indices.shape[0]
    keys = jax.random.split(key, k)
    if multiclass:
        sel = jax.vmap(multiclass_selection_draw)(keys, prep)
    else:
        sel = jax.vmap(lambda kk, p: binary_selection_draw(kk, p, k_rand))(
            keys, prep
        )
    offsets = (jnp.arange(k, dtype=jnp.int32) * seg_len)[:, None]
    return Selection(
        (sel.indices + offsets).reshape(-1),
        sel.slot_valid.reshape(-1),
    )


def multiclass_lambda_selection(
    key: jax.Array,
    instance_logits: jnp.ndarray,  # (N, C)
    valid: jnp.ndarray,            # (N,) bool
    k_top: int,
) -> Tuple[Selection, jnp.ndarray]:
    """The multiclass Λ pattern (reference snuffy_multiclass.py:130-160).

    Per class, take the top-k_top positions; union them (torch.unique —
    ascending), call the count r. Then ref_dim = min(r, n_valid − r); the
    selection is the first ref_dim unique positions plus ref_dim uniform
    draws from the complement of the *full* union. Returns 2·k_top·? slots...
    statically: S = 2·k_top·C is an upper bound; we use S = 2·min(k_top·C, N)
    slots with validity = slot < ref_dim per half.

    Returns (Selection with S slots, ref_dim).
    """
    prep = multiclass_selection_prepare(instance_logits, valid, k_top)
    return multiclass_selection_draw(key, prep), prep.ref_dim
