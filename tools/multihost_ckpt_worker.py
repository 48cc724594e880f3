"""Worker for the REAL 2-process orbax checkpoint test
(tests/test_multihost_real.py::test_orbax_checkpoint_across_cluster_restart):
phase `save` forms a 2-process gloo cluster, runs one dcn=2 sharded MIL
step, and orbax-saves the sharded state (every process writes its own
shards — train/checkpoint.py); then the cluster EXITS. phase `restore` is
a brand-new cluster incarnation that restores straight into the sharded
layout and must reproduce the exact state — the save→kill→restore path a
preempted multi-host job takes (VERDICT r4 item 7). Layout/content checks
the virtual single-process mesh cannot validate: every process really
holds only its own shards, and the restore places them per the target
NamedSharding over the actual wire.

Usage: python tools/multihost_ckpt_worker.py <pid> <port> <workdir> <phase>
Prints one `RESULT <json>` line.
"""

import json
import os
import sys

PID = int(sys.argv[1])
PORT = sys.argv[2]
WORK = sys.argv[3]
PHASE = sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["COORDINATOR_ADDRESS"] = f"localhost:{PORT}"
os.environ["NUM_PROCESSES"] = "2"
os.environ["PROCESS_ID"] = str(PID)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from snuffy_tpu.parallel import distributed  # noqa: E402

distributed.initialize()
assert jax.process_count() == 2 and jax.local_device_count() == 4

from snuffy_tpu.configs import (  # noqa: E402
    MILTrainConfig,
    OptimizerConfig,
    SnuffyModelConfig,
)
from snuffy_tpu.parallel.mesh import make_mesh  # noqa: E402
from snuffy_tpu.parallel.sharded_train import (  # noqa: E402
    fetch_batch_outputs,
    make_global_batch,
    make_sharded_batch_train_step,
    shard_state,
)
from snuffy_tpu.train.checkpoint import (  # noqa: E402
    restore_sharded,
    save_sharded,
)
from snuffy_tpu.train.trainer import SnuffyTrainer  # noqa: E402

CKPT_DIR = os.path.join(WORK, "orbax_ckpt")
out = {"pid": PID, "phase": PHASE}

cfg = MILTrainConfig(
    model=SnuffyModelConfig(feats_size=16, num_heads=2, big_lambda=8,
                            random_patch_share=0.0, attention_dropout=0.0,
                            encoder_dropout=0.0, use_pallas=False),
    optim=OptimizerConfig(optimizer="adamw", lr=1e-3),
    soft_average=True,
)
trainer = SnuffyTrainer(cfg)
spec = distributed.global_mesh_spec()
assert spec.dcn == 2
mesh = make_mesh(spec, num_heads=2)


@jax.jit
def _params_sum(params):
    """Global checksum — identical on both hosts only if the distributed
    state is globally consistent. One jit program: eager op-by-op jax on
    mesh-placed operands is forbidden (CLAUDE.md SIGABRT note)."""
    import jax.numpy as jnp

    return jax.tree_util.tree_reduce(
        lambda acc, leaf: acc + jnp.sum(leaf.astype(jnp.float32)),
        params, jnp.float32(0.0),
    )


def checksums(state):
    return {
        "params_sum": float(np.asarray(_params_sum(state.params))),
        "w": float(np.asarray(state.w)),
        "step": int(np.asarray(state.step)),
    }


with mesh:
    state = shard_state(trainer.init_state(0, example_n=64), mesh)
    if PHASE == "save":
        # One real sharded step so optimizer moments are non-trivial.
        step_fn = make_sharded_batch_train_step(trainer, mesh)
        rng = np.random.default_rng(0)
        feats = rng.standard_normal((8, 64, 16)).astype(np.float32)
        masks = np.ones((8, 64), bool)
        labels = rng.integers(0, 2, (8, 1)).astype(np.float32)
        gfeats, gmasks, glabels, gw = make_global_batch(
            mesh, feats, masks, labels, np.ones((8,), np.float32))
        state, losses, _, _ = step_fn(
            state, gfeats, gmasks, glabels, gw,
            np.float32(1e-3), jax.random.PRNGKey(7))
        (losses_np,) = fetch_batch_outputs(losses)
        out["loss"] = round(float(np.mean(losses_np)), 6)
        save_sharded(CKPT_DIR, 1, state)
        out.update(checksums(state))
    else:
        # Fresh incarnation: restore into the freshly-built sharded layout
        # (state here is only the shape/dtype/sharding skeleton).
        restored = restore_sharded(CKPT_DIR, 1, state)
        out.update(checksums(restored))
        # Every restored leaf must land in the target layout, and this
        # process must hold only its local shards.
        lay0 = jax.tree_util.tree_leaves(restored)[0]
        tmpl0 = jax.tree_util.tree_leaves(state)[0]
        out["sharding_ok"] = all(
            r.sharding == t.sharding
            for r, t in zip(jax.tree_util.tree_leaves(restored),
                            jax.tree_util.tree_leaves(state))
        )
        out["local_only"] = all(
            len(r.addressable_shards) == 4
            for r in jax.tree_util.tree_leaves(restored)
            if hasattr(r, "addressable_shards")
        )
        del lay0, tmpl0

print("RESULT " + json.dumps(out), flush=True)
