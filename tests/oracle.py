"""Pure-numpy oracle of the Snuffy encoder math.

An independent implementation of the semantics documented in SURVEY.md §2.1
(reference snuffy.py:100-168), written against unpadded bags with explicit
selection indices. Tests compare the static-shape JAX model (padded + masked,
on-device selection) against this on the valid sub-bag.
"""

import numpy as np


def layer_norm(x, scale, bias, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def dense(x, kernel, bias):
    return x @ kernel + bias


def inverted_attention_oracle(q, k, v, num_heads):
    """q: (N, d) , k: (S, d), v: (N, d) — already projected.
    Returns (S, d) concat-of-heads output and p_attn (h, N, S)."""
    n, d = q.shape
    s = k.shape[0]
    dk = d // num_heads
    outs, ps = [], []
    for h in range(num_heads):
        sl = slice(h * dk, (h + 1) * dk)
        scores = q[:, sl] @ k[:, sl].T / np.sqrt(dk)  # (N, S)
        scores = scores - scores.max(-1, keepdims=True)
        e = np.exp(scores)
        p = e / e.sum(-1, keepdims=True)  # softmax over S
        outs.append(p.T @ v[:, sl])  # (S, dk)
        ps.append(p)
    return np.concatenate(outs, axis=-1), np.stack(ps)


def encoder_layer_oracle(x, params, sel_idx, num_heads, activation=None):
    """One EncoderLayer forward on an unpadded bag with given selection.

    params: flax param subtree of EncoderLayer converted to numpy.
    """
    act = activation or (lambda t: np.maximum(t, 0.0))
    p = params
    sel_tokens = x[sel_idx]  # keys + residual come from PRE-norm x
    nx = layer_norm(x, p["ln_attn"]["scale"], p["ln_attn"]["bias"])
    q = dense(nx, p["attn"]["wq"]["kernel"], p["attn"]["wq"]["bias"])
    k = dense(sel_tokens, p["attn"]["wk"]["kernel"], p["attn"]["wk"]["bias"])
    v = dense(nx, p["attn"]["wv"]["kernel"], p["attn"]["wv"]["bias"])
    attn, p_attn = inverted_attention_oracle(q, k, v, num_heads)
    attn = dense(attn, p["attn"]["wo"]["kernel"], p["attn"]["wo"]["bias"])
    new_sel = sel_tokens + attn
    y = x.copy()
    y[sel_idx] = new_sel
    ny = layer_norm(y, p["ln_ff"]["scale"], p["ln_ff"]["bias"])
    h = act(dense(ny, p["ff"]["w1"]["kernel"], p["ff"]["w1"]["bias"]))
    ff = dense(h, p["ff"]["w2"]["kernel"], p["ff"]["w2"]["bias"])
    return y + ff, p_attn


def milnet_oracle(x, params, sel_idx_per_layer, num_heads, depth=1):
    """Full MILNet forward (deterministic, unpadded)."""
    ins = dense(
        x, params["i_classifier"]["fc"]["kernel"], params["i_classifier"]["fc"]["bias"]
    )
    enc_params = params["b_classifier"]["encoder"]
    h = x
    p_attn = None
    for i in range(depth):
        h, p_attn = encoder_layer_oracle(
            h, enc_params[f"layer_{i}"], sel_idx_per_layer[i], num_heads
        )
    h = layer_norm(
        h, enc_params["ln_final"]["scale"], enc_params["ln_final"]["bias"]
    )
    pooled = h.mean(0)
    bag = dense(
        pooled,
        params["b_classifier"]["linear"]["kernel"],
        params["b_classifier"]["linear"]["bias"],
    )
    return ins, bag, p_attn


def reference_binary_selection(c, big_lambda, random_patch_share, rng):
    """Reference selection rule (snuffy.py:126-143) in numpy, for checking
    the *structure* of the JAX selection (top part + size rules)."""
    import math

    n = c.shape[0]
    k_top = math.ceil(big_lambda * (1.0 - random_patch_share))
    order = np.argsort(-c, kind="stable")
    top_idx = order[:k_top]
    remaining = sorted(set(range(n)) - set(top_idx.tolist()))
    k_rand = min(int(big_lambda * random_patch_share), max(0, n - k_top))
    rand_idx = rng.choice(remaining, k_rand, replace=False) if k_rand else np.array([], int)
    return top_idx, rand_idx


def reference_multiclass_selection(c, big_lambda, random_patch_share):
    """Reference multiclass top-share rule (snuffy_multiclass.py:133-149):
    per-class top-k → union (ascending) → ref_dim = min(r, n − r) → first
    ref_dim. Returns (top_idx ascending, ref_dim, full_union)."""
    import math

    n = c.shape[0]
    k_top = math.ceil(big_lambda * (1.0 - random_patch_share))
    per_class_tops = [
        np.argsort(-c[:, j], kind="stable")[:k_top] for j in range(c.shape[1])
    ]
    union = np.unique(np.concatenate(per_class_tops))
    r = len(union)
    ref_dim = min(r, n - r)
    return union[:ref_dim], ref_dim, union
