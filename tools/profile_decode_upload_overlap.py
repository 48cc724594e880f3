"""Decode↔upload overlap re-probe (VERDICT r4 item 6, second half).

Round-2 measured that a one-block decode-prefetch thread SLOWS the fused
slide run on this 1-vCPU host: libjpeg decode (GIL-releasing C) and relay
upload serialization contend for the same core, and decode degraded ~50%.
That measurement predates the scaled M/8 decode (r4), which cut decode
work and upload bytes ~23% — so re-measure: predict_slide on the 10k-tile
bench slide, prefetch OFF vs ON, same process, warm programs.

Usage: python tools/profile_decode_upload_overlap.py [repeats]
Prints one JSON line with per-mode total/read/embed timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from snuffy_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache()


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from bench import _ensure_bench_slide, build_inference_programs
    from snuffy_tpu.pipeline.slide_inference import TilerConfig, predict_slide

    emb, embed_fn, milnet_jit, params = build_inference_programs()
    path = _ensure_bench_slide()

    out = {"platform": jax.devices()[0].platform,
           "cpu_count": os.cpu_count(), "repeats": repeats}

    def run(prefetch: bool):
        pred = predict_slide(
            path, embed_fn, emb.params, emb.head_params, milnet_jit, params,
            tiler_cfg=TilerConfig(objective_power=20.0, base_mag=20.0,
                                  tile_size=256, background_threshold=5.0),
            embed_batch=256, embed_size=224, workers=0, prefetch=prefetch,
        )
        return pred.timings

    run(False)  # warm every program once
    for mode, label in ((False, "off"), (True, "on")):
        totals, reads, decodes, embeds = [], [], [], []
        for _ in range(repeats):
            t = run(mode)
            totals.append(t["total_s"])
            reads.append(t["read_filter_s"])
            decodes.append(t["read_decode_s"])
            embeds.append(t["embed_s"])
        out[f"prefetch_{label}"] = {
            "total_s": round(float(np.median(totals)), 3),
            "total_s_minmax": [round(min(totals), 3), round(max(totals), 3)],
            "read_filter_s": round(float(np.median(reads)), 3),
            "read_decode_s": round(float(np.median(decodes)), 3),
            "embed_s": round(float(np.median(embeds)), 3),
        }
    off, on = out["prefetch_off"], out["prefetch_on"]
    out["overlap_speedup"] = round(off["total_s"] / on["total_s"], 4)
    out["decode_slowdown_under_overlap"] = round(
        on["read_decode_s"] / off["read_decode_s"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
