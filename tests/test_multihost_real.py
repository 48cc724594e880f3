"""REAL multi-host validation: two separate python processes form a
jax.distributed CPU cluster (gloo, 4 virtual devices each) and run the
actual multi-host code paths — no monkeypatched gathers anywhere.

Covers: env-var `distributed.initialize`, `global_min_int` /
`sync_metrics` / `sync_epoch_row` over the real wire (including the
None-on-one-host case), `shard_batch_global`'s
make_array_from_process_local_data branch, the dcn=2 sharded MIL train
step, and the DINO CLI end to end with UNEQUAL per-host validation batch
counts — the exact shape of the iteration-agreement deadlock the CLIs
guard against (a hang here fails the test by timeout).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_images(root, n, size=32, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "a"), exist_ok=True)
    for i in range(n):
        arr = (rng.random((size, size, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(root, "a", f"{i}.jpeg"))


def _run_worker_pair(script, extra_args, workdir, timeout=780):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "COORDINATOR_ADDRESS", "NUM_PROCESSES",
                        "PROCESS_ID")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", script),
             str(pid), str(port), workdir, *extra_args],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=REPO,
        )
        for pid in (0, 1)
    ]
    results = {}
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker hung (collective deadlock?)")
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, f"no RESULT line:\n{out[-4000:]}"
        r = json.loads(line[-1][len("RESULT "):])
        results[r["pid"]] = r
    return results


def test_orbax_checkpoint_across_cluster_restart(tmp_path):
    """save → kill → restore over the REAL wire (VERDICT r4 item 7): one
    2-process cluster incarnation runs a dcn=2 sharded MIL step and
    orbax-saves the sharded state (each process writes only its own
    shards); the cluster exits; a brand-new incarnation restores into the
    freshly-built NamedSharding layout. The global checksums must agree
    across hosts within each incarnation AND across the restart — the
    layout/content property the single-process virtual mesh cannot
    validate."""
    work = str(tmp_path)
    saved = _run_worker_pair("multihost_ckpt_worker.py", ["save"], work)
    s0, s1 = saved[0], saved[1]
    assert s0["params_sum"] == s1["params_sum"]
    assert s0["w"] == s1["w"] and s0["step"] == s1["step"]
    assert s0["loss"] == s1["loss"]

    restored = _run_worker_pair("multihost_ckpt_worker.py", ["restore"],
                                work)
    r0, r1 = restored[0], restored[1]
    for r in (r0, r1):
        assert r["sharding_ok"] is True
        assert r["local_only"] is True
        assert r["params_sum"] == s0["params_sum"]
        assert r["w"] == s0["w"] and r["step"] == s0["step"]


def test_two_process_cluster_end_to_end(tmp_path):
    work = str(tmp_path)
    _make_images(os.path.join(work, "imgs"), 24)       # 12/12 per host
    _make_images(os.path.join(work, "val"), 15, seed=1)  # 8/7 → 1 vs 0
    # 4 extraction bags → stride-split 2 per host
    from PIL import Image

    rng = np.random.default_rng(2)
    for cls in ("a", "b"):
        for s in range(2):
            bag = os.path.join(work, "ds", "single", "fold1", "train",
                               cls, f"slide_{cls}{s}")
            os.makedirs(bag)
            for p in range(3):
                arr = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
                Image.fromarray(arr).save(
                    os.path.join(bag, f"{p}_{p}.jpeg"))

    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "COORDINATOR_ADDRESS", "NUM_PROCESSES",
                        "PROCESS_ID")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools",
                                          "multihost_worker.py"),
             str(pid), str(port), work],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=REPO,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=780)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker hung (collective deadlock?)")
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, f"no RESULT line:\n{out[-4000:]}"
        r = json.loads(line[-1][len("RESULT "):])
        results[r["pid"]] = r

    r0, r1 = results[0], results[1]
    # deadlock guard agreed on the minimum
    assert r0["global_min"] == r1["global_min"] == 3
    # count-weighted metric sync incl. a key only host 1 measured
    for r in (r0, r1):
        assert r["sync_n"] == 7.0
        assert abs(r["sync_train"] - (2 * 3 + 3 * 4) / 7) < 1e-6
        assert r["sync_val"] == 7.0
    # global array assembled from per-process rows: sum = 0*8 + 1*8
    assert r0["shard_sum"] == r1["shard_sum"] == 8.0
    # dcn=2 sharded MIL step: identical loss on both controllers
    assert r0["mil_loss"] == r1["mil_loss"]
    # DINO CLI: both hosts took the SAME number of steps (1 epoch × 1
    # agreed batch), only process 0 wrote the log, and the logged means
    # are the synced global values (val ran on 0 agreed batches → None)
    assert r0["dino_step"] == r1["dino_step"] == 1
    assert r0["wrote_log"] is True and r1["wrote_log"] is False
    assert r0["dino_train_loss"] is not None
    assert r0["dino_val_loss"] is None
    # MAE CLI: equal steps both hosts (24 imgs → 12/12 local rows → 1
    # agreed batch), best-val checkpoint written by process 0 only
    assert r0["mae_step"] == r1["mae_step"] == 1
    assert len(r0["mae_best"]) == 1 and r1["mae_best"] == []
    # extraction: 4 bags stride-split 2/2, all CSVs on disk after the
    # real sync_global_devices barrier (dp-sharded patch batches on each
    # host's local mesh)
    assert r0["extract_rows"] == r1["extract_rows"] == 2
    assert r0["extract_csvs"] == 4
