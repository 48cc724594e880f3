"""Pinned perf-shape regressions (VERDICT r3 item 5).

The batched-bags mode is a closed perf thread: it costs 0.69× per bag vs
the serial scan at the bench operating point, attributed (after the full
round-3 ablation, tools/profile_batched_bwd_ablation.py) to XLA's batched
backward schedule — NOT to the scatters, the FFN, or remat. This test pins
the measured ratio so an XLA or relay update that fixes (ratio > 0.85) or
worsens (ratio < 0.60) that schedule is flagged instead of silently
shipping, per VERDICT.md r3 item 5.

RUN_SLOW-gated and runs on the REAL chip: the measurement subprocess strips
the conftest's CPU pin so it dispatches to the axon TPU. Skips when no TPU
is reachable. The suite process itself stays on the virtual CPU mesh.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"),
    reason="real-chip ratio measurement takes ~3 min (RUN_SLOW=1)",
)


def _tpu_env():
    env = dict(os.environ)
    # Undo the conftest/suite CPU pin for the child; sitecustomize re-selects
    # the axon TPU when JAX_PLATFORMS is unset.
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f
    )
    return env


def test_e2e_slide_latency_pinned():
    """Device-side e2e slide latency (embed 10k patches + classify) pinned
    under the <2 s north star with 3% relay-noise grace (VERDICT r4 item 8:
    1.9409 s r3 → 1.9669 s r4, +1.3% drift against a 2.0 s budget — a relay
    or XLA change that pushes it over the line must fail loudly, not ship
    as silent drift)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "profile_embed_latency.py")],
        cwd=REPO, env=_tpu_env(), capture_output=True, text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    if out["platform"] != "tpu":
        pytest.skip(f"no TPU reachable (got {out['platform']}); the north "
                    "star is only pinned on the real chip")
    e2e = out["e2e_slide_latency_s"]
    assert 1.0 <= e2e <= 2.06, (
        f"e2e slide latency {e2e:.4f}s left the pinned band [1.0, 2.06] "
        f"(north star <2 s + 3% relay-noise grace; r4 measured 1.9669). "
        f"Full result: {out}"
    )


def test_batched_vs_serial_ratio_pinned():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "profile_batched_ratio.py")],
        cwd=REPO, env=_tpu_env(), capture_output=True, text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    if out["platform"] != "tpu":
        pytest.skip(f"no TPU reachable (got {out['platform']}); the ratio "
                    "is only pinned on the real chip")
    ratio = out["batched_over_serial"]
    assert 0.60 <= ratio <= 0.85, (
        f"batched/serial per-bag ratio moved to {ratio:.3f} "
        f"(pinned band [0.60, 0.85]; r3 measured 0.69 at B=8). An XLA or "
        f"relay update changed the batched-backward schedule — re-run "
        f"tools/profile_batched_bwd_ablation.py and update CLAUDE.md's "
        f"open-threads note. Full result: {out}"
    )
