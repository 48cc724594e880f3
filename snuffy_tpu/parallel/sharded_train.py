"""Multi-chip MIL training: batched bags under dp × sp × tp shardings.

The reference has no multi-device MIL path at all (reference train.py is
single-process, single-GPU — SURVEY.md §2.14); this module is the TPU-native
scale-out design:

  * a batch of B bags (each padded to N_pad) trains with ONE optimizer step
    whose loss is the mean over bags — the `bag_batch_size > 1` mode of
    MILTrainConfig. Gradients are averaged across the dp axis by XLA (the
    DDP all-reduce equivalent, inserted automatically by GSPMD);
  * the N (token) axis shards over sp for ultra-long bags;
  * encoder weights shard Megatron-style over tp: QKV/FFN-in kernels by
    output column, O/FFN-out kernels by input row.

Everything is one `jit` with NamedSharding annotations — no hand-written
collectives.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from snuffy_tpu.parallel.mesh import (
    BATCH_AXES,
    bag_batch_sharding,
    bag_mask_sharding,
    label_sharding,
    replicated,
)
from snuffy_tpu.parallel.sp_attention import sp_size
from snuffy_tpu.train.losses import mixed_mil_loss, packed_mixed_mil_loss
from snuffy_tpu.train.trainer import MILTrainState, SnuffyTrainer

# Megatron-style column/row parallel rules for the Snuffy encoder.
# Matched against the trailing flax param path.
_TP_RULES = (
    (("attn", "wq", "kernel"), P(None, "tp")),
    (("attn", "wk", "kernel"), P(None, "tp")),
    (("attn", "wv", "kernel"), P(None, "tp")),
    (("attn", "wo", "kernel"), P("tp", None)),
    (("ff", "w1", "kernel"), P(None, "tp")),
    (("ff", "w1", "bias"), P("tp")),
    (("ff", "w2", "kernel"), P("tp", None)),
)


def _spec_for_path(path: Tuple[str, ...]) -> P:
    for suffix, spec in _TP_RULES:
        if len(path) >= len(suffix) and tuple(path[-len(suffix):]) == suffix:
            return spec
    return P()


def _path_names(path) -> Tuple[str, ...]:
    return tuple(p.key if hasattr(p, "key") else str(p) for p in path)


def _sharding_by_path(tree: Any, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for_path(_path_names(path))),
        tree,
    )


def make_param_shardings(params: Any, mesh: Mesh):
    """NamedSharding pytree for the milnet params (tp where it pays off,
    replicated elsewhere)."""
    return _sharding_by_path(params, mesh)


def make_state_shardings(state: MILTrainState, mesh: Mesh):
    param_sh = make_param_shardings(state.params, mesh)
    # Adam moments MIRROR their params' layout: optax state pytrees embed the
    # param tree, so each moment leaf's path ends with the same
    # (layer, module, kernel/bias) suffix the TP rules match on. Scalars
    # (step counts, the loss-mix w's moments) match no rule → replicated.
    # Without this XLA would reshard replicated moments against tp-sharded
    # grads every step (traffic + memory).
    opt_sh = _sharding_by_path(state.opt_state, mesh)
    rep = replicated(mesh)
    return MILTrainState(param_sh, rep, opt_sh, rep)


def make_sharded_batch_train_step(trainer: SnuffyTrainer, mesh: Mesh):
    """jitted (state, feats (B,N,D), masks (B,N), labels (B,C), bag_w (B,),
    lr, rng) → (state, losses (B,), bag_scores (B,C), ins_scores (B,N,C)).

    One optimizer step per batch of bags; the loss is the bag_w-weighted
    mean (zero weights mark padding bags in a short tail batch — same
    contract as SnuffyTrainer._batched_train_step, so the Runner can drive
    either interchangeably); grads averaged over bags (and thus psum'd over
    dp by XLA).

    With sp > 1 the model routes its gather/attention/scatter through the
    explicit shard_map ops (parallel/sp_attention.py) so the (N, d) residual
    stream keeps a true N/sp per-device shard; the bag vmap then needs
    `spmd_axis_name` so the batch axis stays sharded over (dcn, dp) through
    the manual regions instead of being all-gathered.

    With sp == 1 the per-bag forward/backward runs inside a dp-MANUAL
    shard_map (sp/tp axes stay GSPMD-auto, so Megatron tp still composes).
    Pure GSPMD propagation is NOT enough here: left auto, XLA's scatter/
    top-k partitioning replicates the per-bag (h, N, Λ) attention probs —
    an all-gather of every bag's probs to every dp device, measured at
    9.5 MB/step even at toy shapes (tests/test_collective_audit.py pins
    the fix: the only collective left is the grad psum, whose size equals
    the param count — the DDP-equivalent minimum). Bags never mix until
    the loss mean, so each device can run its own bags start-to-finish.
    """
    from jax.sharding import PartitionSpec

    from snuffy_tpu.models.snuffy import build_milnet

    tp = mesh.shape.get("tp", 1)
    batch_extent = mesh.shape.get("dcn", 1) * mesh.shape.get("dp", 1)
    if sp_size(mesh) > 1:
        model = build_milnet(trainer.cfg.model, mesh=mesh)
        dp_manual = False
    else:
        mcfg = trainer.cfg.model
        if tp > 1 and mcfg.use_pallas:
            # pallas_call has no GSPMD partitioning rule: left on the
            # tp-auto axes, XLA would replicate the kernel — an all-gather
            # of every bag's padded (h, N, Λ) probs residual across tp,
            # each layer, fwd and bwd. Building the model WITH the mesh
            # routes attention through the head-sharded shard_map wrapper
            # (parallel/tp_attention.py): the fused kernel runs on each
            # tp shard's own heads with zero collectives inside
            # (VERDICT r4 item 5; traffic pinned by
            # tests/test_collective_audit.py).
            model = build_milnet(mcfg, mesh=mesh)
        else:
            model = trainer.model
        # Manual axes of size 1 wrapped around a tp all-reduce trip an XLA
        # SPMD RET_CHECK ("Cross-partition allreduce must be in (partial)
        # manual partitioning mode"); with one batch shard there is nothing
        # to keep local anyway.
        dp_manual = batch_extent > 1

    def loss_fn(group, feats_b, masks_b, labels_b, bag_w, rng):
        def one_bag(feats, mask, label, key):
            k1, k2 = jax.random.split(key)
            ins_logits, bag_logits, _ = model.apply(
                {"params": group["model"]},
                feats,
                mask,
                False,
                rngs={"sparse": k1, "dropout": k2},
            )
            pw = (
                None
                if trainer.pos_weight is None
                else jnp.asarray(trainer.pos_weight)
            )
            loss, score = mixed_mil_loss(
                ins_logits, bag_logits, label, mask, group["w"], pw
            )
            return loss, score, jax.nn.sigmoid(ins_logits)

        def local_shard(f, m, l, k):
            """One device's bag shard. bag_batch_impl='packed' folds the
            local bags along the row axis (MILNet(segments=B_local)) —
            M=B_local·N GEMMs and a flat backward beat the vmapped graph
            by 10-19% per bag at B≥4 (tools/profile_packed_bags.py);
            per-bag semantics are identical (tests/test_packed_bags.py).
            Packed does not compose with tp/sp row- or head-sharding, and
            a 1-bag shard has nothing to fold — vmap in those cases."""
            bl = f.shape[0]
            if (trainer.cfg.bag_batch_impl != "packed" or bl == 1
                    or tp > 1 or sp_size(mesh) > 1):
                return jax.vmap(one_bag)(f, m, l, k)
            n, d = f.shape[1], f.shape[2]
            model_p = build_milnet(trainer.cfg.model, segments=bl)
            k1, k2 = jax.random.split(k[0])
            ins_logits, bag_logits, _ = model_p.apply(
                {"params": group["model"]},
                f.reshape(bl * n, d),
                m.reshape(bl * n),
                False,
                rngs={"sparse": k1, "dropout": k2},
            )
            pw = (
                None
                if trainer.pos_weight is None
                else jnp.asarray(trainer.pos_weight)
            )
            losses, scores = packed_mixed_mil_loss(
                ins_logits, bag_logits, l, m.reshape(bl * n), group["w"],
                pw, segments=bl,
            )
            return losses, scores, jax.nn.sigmoid(ins_logits).reshape(
                bl, n, -1
            )

        keys = jax.random.split(rng, feats_b.shape[0])
        if dp_manual:
            # Each device maps over ITS OWN bag shard; `group` rides in by
            # closure (replicated params — their cotangents psum over the
            # manual axes; grads verified equal to the auto path at bf16
            # noise). check_vma=False: the Pallas attention kernel has no
            # varying-mesh-axes annotations.
            bspec = PartitionSpec(BATCH_AXES)
            losses, scores, ins = jax.shard_map(
                local_shard,
                mesh=mesh,
                in_specs=(bspec, bspec, bspec, bspec),
                out_specs=(bspec, bspec, bspec),
                axis_names={"dcn", "dp"},
                check_vma=False,
            )(feats_b, masks_b, labels_b, keys)
        else:
            losses, scores, ins = jax.vmap(
                one_bag, spmd_axis_name=BATCH_AXES
            )(feats_b, masks_b, labels_b, keys)
        mean = jnp.sum(losses * bag_w) / jnp.maximum(jnp.sum(bag_w), 1.0)
        return mean, (losses, scores, ins)

    def step(state: MILTrainState, feats_b, masks_b, labels_b, bag_w, lr,
             rng):
        group = {"model": state.params, "w": state.w}
        (_, (losses, scores, ins)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(group, feats_b, masks_b, labels_b, bag_w, rng)
        updates, opt_state = trainer.tx.update(grads, state.opt_state, group)
        mult = trainer.cfg.optim.single_weight_lr_multiplier
        new_params = jax.tree_util.tree_map(
            lambda p, u: p - lr * u, group["model"], updates["model"]
        )
        new_w = jnp.clip(group["w"] - lr * mult * updates["w"], 0.0, 1.0)
        return (
            MILTrainState(new_params, new_w, opt_state, state.step + 1),
            losses,
            scores,
            ins,
        )

    # State shardings are inherited from the arrays' placement (shard_state);
    # only the data shardings are pinned here.
    return jax.jit(
        step,
        in_shardings=(
            None,
            bag_batch_sharding(mesh),
            bag_mask_sharding(mesh),
            label_sharding(mesh),
            NamedSharding(mesh, P(BATCH_AXES)),
            None,
            None,
        ),
        donate_argnums=(0,),
    )


def shard_state(state: MILTrainState, mesh: Mesh) -> MILTrainState:
    """Place a host-built train state onto the mesh."""
    sh = make_state_shardings(state, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, sh
    )


def fetch_batch_outputs(*arrays):
    """Per-bag step outputs (sharded over the batch axes) → host numpy.

    Multi-host, `np.asarray` on a (dcn, dp)-sharded output raises (the
    array spans non-addressable devices); every host needs the full
    per-bag vectors for its epoch logs/metrics, so allgather them.
    """
    import numpy as np

    if jax.process_count() == 1:
        return tuple(np.asarray(a) for a in arrays)
    from jax.experimental import multihost_utils

    return tuple(
        np.asarray(multihost_utils.process_allgather(a, tiled=True))
        for a in arrays
    )


def make_global_batch(mesh: Mesh, feats_b, masks_b, labels_b, bag_w):
    """Host-local numpy bag batch → the global jax.Arrays the sharded step
    was pinned to.

    Single-process this is a no-op (jit places numpy per its
    in_shardings); with multiple controllers jit REJECTS raw numpy for
    non-replicated shardings, so each array is assembled with
    `make_array_from_callback` — every host holds the identical full
    batch (the MIL Runner loads the same dataset everywhere), and each
    device fetches its own index slice.
    """
    if jax.process_count() == 1:
        return feats_b, masks_b, labels_b, bag_w
    shardings = (
        bag_batch_sharding(mesh),
        bag_mask_sharding(mesh),
        label_sharding(mesh),
        NamedSharding(mesh, P(BATCH_AXES)),
    )
    import numpy as np

    out = []
    for a, s in zip((feats_b, masks_b, labels_b, bag_w), shardings):
        a = np.asarray(a)
        out.append(jax.make_array_from_callback(
            a.shape, s, lambda idx, a=a: a[idx]
        ))
    return tuple(out)
