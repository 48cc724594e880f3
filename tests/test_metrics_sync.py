"""Cross-host metric aggregation (reference dino_adapter/utils.py:229-405).

jax.distributed can't run two real processes inside one pytest run, so the
host-side all-gather is simulated by patching the module's process-count
and gather hooks with a second fake host's rows; the device-side
mesh_metric_mean path runs a REAL collective on the 8-device virtual mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snuffy_tpu.utils import metrics_sync as ms


@pytest.fixture
def two_processes(monkeypatch):
    """Simulate P=2: this host's vector plus a deterministic 'other host'
    whose values are each local value + 1."""

    def fake_gather(vals):
        return np.stack([vals, vals + 1.0], axis=0)

    monkeypatch.setattr(ms, "_process_count", lambda: 2)
    monkeypatch.setattr(ms, "_allgather_rows", fake_gather)


def test_sync_metrics_average(two_processes):
    out = ms.sync_metrics({"loss": 2.0, "acc": 0.5})
    assert out["loss"] == pytest.approx(2.5)   # mean(2, 3)
    assert out["acc"] == pytest.approx(1.0)    # mean(0.5, 1.5)


def test_sync_metrics_sum_and_none_passthrough(two_processes):
    out = ms.sync_metrics({"count": 10.0, "val_loss": None}, average=False)
    assert out["count"] == pytest.approx(21.0)  # 10 + 11
    assert out["val_loss"] is None


def test_sync_metrics_count_weighted(two_processes):
    # Host 0: mean 4.0 over 3 batches; host 1 (fake): mean 5.0 over 4.
    # Exact global mean = (4*3 + 5*4) / 7.
    out = ms.sync_metrics(
        {"train_loss": 4.0, "n": 3.0}, weight_key="n"
    )
    assert out["n"] == pytest.approx(7.0)
    assert out["train_loss"] == pytest.approx((4 * 3 + 5 * 4) / 7)


def test_sync_metrics_single_process_is_identity():
    d = {"loss": 1.5, "val_loss": None}
    assert ms.sync_metrics(d) == d


def test_smoothed_value_window_and_global():
    v = ms.SmoothedValue(window_size=3)
    for x in [1.0, 2.0, 3.0, 4.0]:
        v.update(x)
    assert v.value == 4.0
    assert v.max == 4.0
    assert v.median == pytest.approx(3.0)       # window [2, 3, 4]
    assert v.avg == pytest.approx(3.0)
    assert v.global_avg == pytest.approx(2.5)   # all four
    assert "(" in str(v)


def test_smoothed_value_sync_reduces_count_total(two_processes):
    v = ms.SmoothedValue()
    v.update(2.0, n=4)  # count=4, total=8
    v.synchronize_between_processes()
    # fake other host: count=5, total=9 → global_avg 17/9
    assert v.count == 9
    assert v.global_avg == pytest.approx(17 / 9)
    assert len(v.deque) == 1  # deque stays local (reference warning)


def test_metric_logger_meters_and_sync(two_processes):
    log = ms.MetricLogger()
    log.update(loss=1.0, lr=0.1)
    log.update(loss=3.0, lr=0.1)
    assert log.loss.global_avg == pytest.approx(2.0)
    log.synchronize_between_processes()
    # each meter's (count=2, total) joined by fake host (count=3, total+1)
    assert log.loss.count == 5
    ga = log.global_averages()
    assert ga["loss"] == pytest.approx((4.0 + 5.0) / 5)
    assert "loss" in str(log)
    with pytest.raises(AttributeError):
        log.never_logged


def test_mesh_metric_mean_real_collective():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()[:8]
    mesh = Mesh(np.asarray(devs).reshape(2, 2, 2), ("dcn", "dp", "sp"))
    per_device = jnp.arange(8.0)
    x = jax.device_put(
        per_device, NamedSharding(mesh, P(("dcn", "dp", "sp")))
    )
    out = jax.jit(lambda x: ms.mesh_metric_mean(x, mesh))(x)
    assert float(out) == pytest.approx(3.5)
    assert out.shape == ()


def test_sync_metrics_none_on_one_host_only(monkeypatch):
    """A key that is None on THIS host but measured on another (e.g. a
    host whose stride-shard had no validation batch) must still ride the
    wire — same vector length on every process — and reduce over the
    hosts that have it."""
    def fake_gather(vals):
        other = np.where(np.isnan(vals), 7.0, vals + 1.0)
        return np.stack([vals, other], axis=0)

    monkeypatch.setattr(ms, "_process_count", lambda: 2)
    monkeypatch.setattr(ms, "_allgather_rows", fake_gather)
    out = ms.sync_metrics({"train_loss": 2.0, "val_loss": None, "n": 3.0},
                          weight_key="n")
    assert out["n"] == pytest.approx(7.0)          # 3 + 4
    # val_loss: only the fake host has it (7.0), weighted by ITS count 4
    assert out["val_loss"] == pytest.approx(7.0)
    assert out["train_loss"] == pytest.approx((2 * 3 + 3 * 4) / 7)


def test_global_min_int(monkeypatch):
    assert ms.global_min_int(5) == 5  # single process: identity

    def fake_gather(vals):
        return np.stack([vals, vals - 2.0], axis=0)

    monkeypatch.setattr(ms, "_process_count", lambda: 2)
    monkeypatch.setattr(ms, "_allgather_rows", fake_gather)
    assert ms.global_min_int(5) == 3  # min(5, 3) — the deadlock guard


def test_sync_epoch_row(two_processes, monkeypatch):
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    row, writer = ms.sync_epoch_row(
        {"epoch": 4, "train_loss": 4.0, "val_loss": None}, n_batches=3
    )
    assert writer is True
    assert row["epoch"] == 4                       # passes through
    assert row["n_train_batches"] == pytest.approx(7.0)  # 3 + 4
    assert row["train_loss"] == pytest.approx((4 * 3 + 5 * 4) / 7)

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    _, writer = ms.sync_epoch_row({"epoch": 0, "x": 1.0}, n_batches=1)
    assert writer is False
