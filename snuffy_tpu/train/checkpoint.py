"""Sharded (multi-chip / multi-host) checkpointing on orbax.

The single-host MIL runner keeps the reference's artifact contract with
flax-msgpack files + thresholds JSON side files (train/runner.py,
reference train.py:643-675). That path materializes the full state on one
host — fine for one chip, wrong for a sharded `MILTrainState` living on a
`dcn × dp × sp × tp` mesh (parallel/sharded_train.py): gathering TB-scale
params to host 0 wastes DCN bandwidth and HBM, and a restore must lay
shards back out device-by-device.

This module is the mesh-aware path: orbax writes each process's shards in
parallel (every process participates — no process-0 gating here, unlike the
JSONL metric writes guarded by `parallel.distributed.is_main_process`) and
restores directly into the target `NamedSharding` layout.

The reference has no distributed-checkpoint counterpart at all (its DDP
ranks all hold full replicas; rank 0 torch.save's —
dino_adapter/utils.py:449-471); this is a TPU-native extension required by
SURVEY §2.14's multi-host contract.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def _abstract_like(state_like: Any) -> Any:
    """Shape/dtype/sharding skeleton orbax restores into."""
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        if hasattr(x, "sharding")
        else x,
        state_like,
    )


def save_sharded(directory: str, step: int, state: Any) -> None:
    """Write `state` (a pytree of possibly-sharded jax.Arrays) under
    `directory/<step>`. Collective: call from every process."""
    ocp = _ocp()
    path = os.path.abspath(os.path.join(directory, str(step)))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore_sharded(directory: str, step: int, state_like: Any) -> Any:
    """Restore the checkpoint at `directory/<step>` into the sharding layout
    of `state_like` (a concrete or abstract pytree whose leaves carry
    `.sharding`). Collective: call from every process."""
    ocp = _ocp()
    path = os.path.abspath(os.path.join(directory, str(step)))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, _abstract_like(state_like))


class ShardedCheckpointManager:
    """Rolling sharded checkpoints with retention + best-step pinning, the
    mesh-aware counterpart of Runner.save_checkpoint/clean_up.

    Wraps `orbax.checkpoint.CheckpointManager`: saves are atomic (tmp-dir
    rename), garbage collection keeps the `max_to_keep` newest steps, and
    — mirroring the runner's best-AUC retention (reference
    train.py:780-794 clean_up) — the best step by `best_metric` is always
    preserved when `metrics` are passed to `save`."""

    def __init__(
        self,
        directory: str,
        max_to_keep: Optional[int] = 3,
        best_metric: Optional[str] = "valid_auc",
        best_mode: str = "max",
    ):
        ocp = self._ocp = _ocp()
        best_fn: Optional[Callable] = (
            (lambda m: m[best_metric]) if best_metric else None
        )
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=best_fn,
                best_mode=best_mode,
                # With a best_fn configured, orbax defaults to keeping every
                # step saved without metrics — save(step, state) calls with
                # metrics=None would then never be garbage-collected and the
                # directory grows without bound.
                keep_checkpoints_without_metrics=False,
                create=True,
            ),
        )

    def save(self, step: int, state: Any,
             metrics: Optional[dict] = None) -> None:
        self._mgr.save(
            step,
            args=self._ocp.args.StandardSave(state),
            metrics=metrics,
            force=True,
        )
        self._mgr.wait_until_finished()

    def restore(self, step: int, state_like: Any) -> Any:
        return self._mgr.restore(
            step, args=self._ocp.args.StandardRestore(_abstract_like(state_like))
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def all_steps(self):
        return self._mgr.all_steps()

    def close(self) -> None:
        self._mgr.close()
