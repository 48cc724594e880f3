"""Measure the device-side e2e slide latency (the <2 s north star) on the
real chip and print ONE JSON line — the measurement behind the RUN_SLOW
regression pin in tests/test_perf_regression.py (VERDICT r4 item 8).

Reuses bench.py's programs and repeated-window timing: ViT-S/16 embed rate
over REPEATS windows of >= 2 s, plus the Snuffy classify latency, composed
exactly like BENCH_r*.json's e2e_slide_latency_s (10k patches / rate +
classify). r3 measured 1.9409 s, r4 1.9669 s — 1.4% headroom under the
north-star line, so this number is pinned rather than hoped about.
"""

from __future__ import annotations

import json
import statistics
import sys

sys.path.insert(0, ".")

import jax

import bench


def main() -> None:
    platform = jax.devices()[0].platform
    emb, embed_fn, milnet_jit, params = bench.build_inference_programs()
    rate, windows = bench.bench_embeddings_per_sec(emb, embed_fn)
    e2e, embed_s, classify_s = bench.bench_slide_latency(
        rate, milnet_jit, params
    )
    print(json.dumps({
        "platform": platform,
        "e2e_slide_latency_s": round(e2e, 4),
        "e2e_embed_s": round(embed_s, 4),
        "e2e_classify_s": round(classify_s, 4),
        "embed_rate_median": round(rate, 1),
        "embed_rate_windows": [round(w, 1) for w in windows],
        "embed_rate_spread": round(
            (max(windows) - min(windows)) / statistics.median(windows), 4),
    }))


if __name__ == "__main__":
    main()
