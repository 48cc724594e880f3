"""MIL training runtime: jitted per-bag optimizer steps, scanned per bucket.

The reference trains with one optimizer step per bag, bags visited in a
shuffled order (reference train.py:223-293). A literal port would launch one
tiny dispatch per bag; here the epoch is restructured TPU-first:

  * bags are bucketed to static lengths (data/bucketing.py) and stacked into
    (B, N_pad, D) arrays per bucket;
  * one `lax.scan` per bucket performs the B sequential optimizer steps in a
    single XLA program with donated model/optimizer state — identical
    serial-SGD semantics, ~zero dispatch overhead;
  * bucket visit order is shuffled each epoch; within a bucket the bag order
    is shuffled too. (The reference's global shuffle interleaves sizes; the
    grouped shuffle is the static-shape equivalent — parity is statistical,
    SURVEY.md §7 "Nondeterminism parity".)

Optimizer semantics (reference train.py:165-180, 809-826):
  * adam  = torch Adam (L2 weight decay folded into the gradient);
  * adamw = torch AdamW (decoupled weight decay);
  * betas/eps/weight_decay apply to every parameter group, including the
    learnable loss-mixing scalar `w`;
  * `w` gets lr · single_weight_lr_multiplier and is clamped to [0,1] after
    each step (train.py:818-826, 852-854); frozen unless soft_average;
  * grad-clip (global norm) applies to the milnet parameters only
    (train.py:468-470 clips `self.milnet.parameters()`).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from snuffy_tpu.configs import MILTrainConfig, OptimizerConfig
from snuffy_tpu.models.snuffy import MILNet, build_milnet
from snuffy_tpu.train.losses import mixed_mil_loss, packed_mixed_mil_loss


class MILTrainState(NamedTuple):
    params: Any            # milnet parameter pytree
    w: jnp.ndarray         # single_weight_parameter, scalar in [0,1]
    opt_state: Any
    step: jnp.ndarray      # global step counter


def _direction_transform(optim: OptimizerConfig) -> optax.GradientTransformation:
    """lr-less update direction for one parameter group.

    Returns the positive 'descent direction' (caller applies −lr·mult).
    torch-Adam folds L2 into the grad before the moments; torch-AdamW decays
    after the moments (decoupled).
    """
    b1, b2 = optim.betas
    adam = optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8)
    if optim.optimizer == "adam":
        return optax.chain(optax.add_decayed_weights(optim.weight_decay), adam)
    if optim.optimizer == "adamw":
        return optax.chain(adam, optax.add_decayed_weights(optim.weight_decay))
    raise KeyError(
        f"Optimizer not found. Given: {optim.optimizer}, Have: ['adam', 'adamw']"
    )


def make_optimizer(optim: OptimizerConfig, soft_average: bool) -> optax.GradientTransformation:
    """Two-group transform over {'model': ..., 'w': ...} pytrees."""
    model_tx = _direction_transform(optim)
    if optim.clip_grad is not None:
        model_tx = optax.chain(optax.clip_by_global_norm(optim.clip_grad), model_tx)
    w_tx = _direction_transform(optim) if soft_average else optax.set_to_zero()
    return optax.multi_transform(
        {"model": model_tx, "w": w_tx},
        param_labels={"model": "model", "w": "w"},
    )


def _maybe_mesh(cfg: MILTrainConfig):
    """Mesh for the batched-bags mode (multi-chip MIL training — the
    reference is single-GPU here, SURVEY.md §2.14 TPU contract).

    cfg.use_mesh: None = auto (dp-only mesh over every chip, engaged only
    when bag_batch_size divides evenly — otherwise silently single-device,
    so small-batch runs and tests keep the plain path); 1 = the full
    dp×sp×tp factoring (factor_devices), validation errors raised loudly;
    0 = never."""
    if cfg.bag_batch_size <= 1 or jax.device_count() <= 1:
        return None
    want = cfg.use_mesh
    if want is not None and int(want) == 0:
        return None
    from snuffy_tpu.parallel.mesh import (
        MeshSpec,
        factor_devices,
        make_mesh,
    )

    procs = jax.process_count()
    if want is not None and int(want) == 1:
        spec = factor_devices(jax.device_count(), procs)
        if cfg.bag_batch_size % (spec.dcn * spec.dp):
            raise ValueError(
                f"bag_batch_size={cfg.bag_batch_size} must divide over the "
                f"batch axes dcn×dp={spec.dcn * spec.dp} (use_mesh=1)"
            )
        return make_mesh(spec, num_heads=cfg.model.num_heads)
    n = jax.device_count()
    if cfg.bag_batch_size % n:
        return None
    return make_mesh(MeshSpec(n // procs, 1, 1, dcn=procs))


class SnuffyTrainer:
    """Owns the model/optimizer and the jitted step/epoch functions
    (counterpart of reference train.py Trainer/SmallWeightTrainer/Snuffy)."""

    def __init__(self, cfg: MILTrainConfig):
        if cfg.bag_batch_impl not in ("packed", "vmap"):
            # Loud, not silent: an unknown impl string would otherwise
            # fall through to the slower vmap path with no warning (the
            # same silent-downgrade class the crop_pack check guards).
            raise ValueError(
                f"bag_batch_impl must be 'packed' or 'vmap', got "
                f"{cfg.bag_batch_impl!r}"
            )
        self.cfg = cfg
        self.model: MILNet = build_milnet(cfg.model)
        self.tx = make_optimizer(cfg.optim, cfg.soft_average)
        self.pos_weight: Optional[float] = None  # set for MIL datasets
        self.mesh = _maybe_mesh(cfg)
        self._epoch_fns: Dict[Tuple[int, bool], Any] = {}
        self._eval_fns: Dict[int, Any] = {}

    # ---------------------------------------------------------------- state

    def init_state(self, seed: int, example_n: int = 64) -> MILTrainState:
        k_param, k_sparse = jax.random.split(jax.random.PRNGKey(seed))
        feats = jnp.zeros((example_n, self.cfg.model.feats_size), jnp.float32)
        mask = jnp.ones((example_n,), bool)
        variables = self.model.init(
            {"params": k_param, "sparse": k_sparse}, feats, mask, True
        )
        params = variables["params"]
        w = jnp.asarray(0.5, jnp.float32)
        opt_state = self.tx.init({"model": params, "w": w})
        return MILTrainState(params, w, opt_state, jnp.asarray(0, jnp.int32))

    # ----------------------------------------------------------- single bag

    def _bag_loss_fn(self, group, feats, mask, label, rngs, deterministic):
        ins_logits, bag_logits, _ = self.model.apply(
            {"params": group["model"]},
            feats,
            mask,
            deterministic,
            rngs=rngs,
        )
        pw = None if self.pos_weight is None else jnp.asarray(self.pos_weight)
        loss, bag_score = mixed_mil_loss(
            ins_logits, bag_logits, label, mask, group["w"], pw
        )
        return loss, (bag_score, jax.nn.sigmoid(ins_logits))

    def _train_step(self, state: MILTrainState, feats, mask, label, lr, rng):
        k_sparse, k_drop = jax.random.split(rng)
        rngs = {"sparse": k_sparse, "dropout": k_drop}
        group = {"model": state.params, "w": state.w}
        grad_fn = jax.value_and_grad(self._bag_loss_fn, has_aux=True)
        (loss, (bag_score, ins_score)), grads = grad_fn(
            group, feats, mask, label, rngs, False
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, group)
        mult = self.cfg.optim.single_weight_lr_multiplier
        new_params = jax.tree_util.tree_map(
            lambda p, u: p - lr * u, group["model"], updates["model"]
        )
        new_w = jnp.clip(group["w"] - lr * mult * updates["w"], 0.0, 1.0)
        return (
            MILTrainState(new_params, new_w, opt_state, state.step + 1),
            loss,
            bag_score,
            ins_score,
        )

    # -------------------------------------------------------- bucket epochs

    def _scan_bucket(self, state, feats_b, masks_b, labels_b, lr, rng):
        """One optimizer step per bag over a (B, N_pad, D) stack, serially."""

        def body(carry, xs):
            st, key = carry
            feats, mask, label = xs
            key, sub = jax.random.split(key)
            st, loss, bag_score, ins_score = self._train_step(
                st, feats, mask, label, lr, sub
            )
            return (st, key), (loss, bag_score, ins_score)

        (state, _), (losses, scores, ins_scores) = jax.lax.scan(
            body, (state, rng), (feats_b, masks_b, labels_b)
        )
        return state, losses, scores, ins_scores

    def train_bucket_fn(self, n_pad: int):
        """Compiled serial-step scan for one bucket length (cached)."""
        key = (n_pad, True)
        if key not in self._epoch_fns:
            self._epoch_fns[key] = jax.jit(self._scan_bucket, donate_argnums=(0,))
        return self._epoch_fns[key]

    # ------------------------------------------------- batched-bags mode

    def _batched_train_step(self, state, feats_b, masks_b, labels_b, bag_w,
                            lr, rng):
        """ONE optimizer step over a batch of bags: loss = weighted mean
        (bag_w zeroes padding bags). The `bag_batch_size > 1` mode of
        MILTrainConfig — larger device batches at the cost of the
        reference's strict serial-step semantics."""

        def loss_fn(group):
            def one(feats, mask, label, key):
                k1, k2 = jax.random.split(key)
                rngs = {"sparse": k1, "dropout": k2}
                loss, (score, ins) = self._bag_loss_fn(
                    group, feats, mask, label, rngs, False
                )
                return loss, score, ins

            keys = jax.random.split(rng, feats_b.shape[0])
            losses, scores, ins = jax.vmap(one)(feats_b, masks_b, labels_b,
                                                keys)
            mean = jnp.sum(losses * bag_w) / jnp.maximum(jnp.sum(bag_w), 1.0)
            return mean, (losses, scores, ins)

        group = {"model": state.params, "w": state.w}
        (mean_loss, (losses, scores, ins)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(group)
        updates, opt_state = self.tx.update(grads, state.opt_state, group)
        mult = self.cfg.optim.single_weight_lr_multiplier
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

    # ------------------------------------------------- packed-bags mode

    def _packed_train_step(self, state, feats_b, masks_b, labels_b, bag_w,
                           lr, rng):
        """Same contract and semantics as `_batched_train_step`, computed
        as ONE packed forward: the B bags fold along the row axis into a
        (B·N, d) program, so every GEMM runs at M=B·N (the MIL shapes are
        M-bound, ROOFLINE.md §1/§3) and the graph stays unbatched —
        sidestepping the vmap backward-schedule penalty (ROUND3.md)."""
        b, n, d = feats_b.shape
        model_p = build_milnet(self.cfg.model, segments=b)

        def loss_fn(group):
            k1, k2 = jax.random.split(rng)
            ins_logits, bag_logits, _ = model_p.apply(
                {"params": group["model"]},
                feats_b.reshape(b * n, d),
                masks_b.reshape(b * n),
                False,
                rngs={"sparse": k1, "dropout": k2},
            )
            pw = (
                None if self.pos_weight is None
                else jnp.asarray(self.pos_weight)
            )
            losses, scores = packed_mixed_mil_loss(
                ins_logits, bag_logits, labels_b, masks_b.reshape(b * n),
                group["w"], pw, segments=b,
            )
            mean = jnp.sum(losses * bag_w) / jnp.maximum(jnp.sum(bag_w), 1.0)
            ins = jax.nn.sigmoid(ins_logits).reshape(b, n, -1)
            return mean, (losses, scores, ins)

        group = {"model": state.params, "w": state.w}
        (_, (losses, scores, ins)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(group)
        updates, opt_state = self.tx.update(grads, state.opt_state, group)
        mult = self.cfg.optim.single_weight_lr_multiplier
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

    def train_bucket_batched_fn(self, n_pad: int, batch: int):
        key = (n_pad, "batched", batch, self.mesh is not None,
               self.cfg.bag_batch_impl)
        if key not in self._epoch_fns:
            if self.mesh is not None:
                # multi-chip: same (state, feats, masks, labels, bag_w, lr,
                # rng) contract, batch sharded over the mesh's batch axes
                from snuffy_tpu.parallel.sharded_train import (
                    make_sharded_batch_train_step,
                )

                self._epoch_fns[key] = make_sharded_batch_train_step(
                    self, self.mesh
                )
            elif self.cfg.bag_batch_impl == "packed":
                self._epoch_fns[key] = jax.jit(
                    self._packed_train_step, donate_argnums=(0,)
                )
            else:
                self._epoch_fns[key] = jax.jit(
                    self._batched_train_step, donate_argnums=(0,)
                )
        return self._epoch_fns[key]

    # Eval chunk size: buckets are evaluated in fixed-size packed chunks
    # (tail chunks padded with masked dummy bags) so every bucket reuses
    # ONE compiled program shape per (n_pad, chunk) instead of a
    # whole-bucket program per bucket size.
    EVAL_CHUNK = 8

    def eval_bucket_fn(self, n_pad: int, batch: int = EVAL_CHUNK):
        """Packed deterministic forward for one (bucket length, chunk)
        shape (cached).

        Selection randomness still draws from the 'sparse' stream (the
        reference samples the random share at eval too, snuffy.py:141).

        The chunk runs the packed row-axis layout, never a bag vmap: the
        vmapped eval forward measured 2.1× the packed per-bag cost on chip
        AND its compile time explodes with the batch (B=2 compiled in
        138 s, B=4 did not finish in 15 min), while the packed program is
        flat and compiles like a single big bag
        (tools/profile_packed_bags.py eval mode).
        """
        key = (n_pad, batch)
        if key not in self._eval_fns:

            def eval_packed(group, feats_b, masks_b, labels_b, rng):
                # segments come from the traced batch shape, so the
                # compiled fn is correct for ANY leading dim a caller
                # passes (jit re-traces per shape; `batch` is a cache key).
                b, n, d = feats_b.shape
                model_p = (
                    self.model if b == 1
                    else build_milnet(self.cfg.model, segments=b)
                )
                ins_logits, bag_logits, _ = model_p.apply(
                    {"params": group["model"]},
                    feats_b.reshape(b * n, d),
                    masks_b.reshape(b * n),
                    True,
                    rngs={"sparse": rng},
                )
                pw = (
                    None
                    if self.pos_weight is None
                    else jnp.asarray(self.pos_weight)
                )
                losses, scores = packed_mixed_mil_loss(
                    ins_logits, bag_logits, labels_b,
                    masks_b.reshape(b * n), group["w"], pw, segments=b,
                )
                return losses, scores, jax.nn.sigmoid(ins_logits).reshape(
                    b, n, -1
                )

            self._eval_fns[key] = jax.jit(eval_packed)
        return self._eval_fns[key]

    # ------------------------------------------------------------ host API

    def run_train_epoch(
        self,
        state: MILTrainState,
        bucketed: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]],
        lr: float,
        rng: np.random.Generator,
        seed: int,
    ):
        """bucketed: {n_pad: (feats (B,N,D), masks (B,N), labels (B,C),
        orig_index (B,))}. Returns (state, losses, bag_scores, ins_scores,
        order) aligned to the original bag indexing."""
        order = []
        losses, scores, ins_list = [], [], []
        batch = max(1, self.cfg.bag_batch_size)
        bucket_keys = list(bucketed.keys())
        rng.shuffle(bucket_keys)
        for n_pad in bucket_keys:
            feats_b, masks_b, labels_b, idx = bucketed[n_pad]
            perm = rng.permutation(len(idx))
            feats_b, masks_b, labels_b, idx = (
                feats_b[perm],
                masks_b[perm],
                labels_b[perm],
                idx[perm],
            )
            key = jax.random.PRNGKey(int(rng.integers(2**31)) ^ seed)
            if batch == 1:
                fn = self.train_bucket_fn(n_pad)
                state, l, s, ins = fn(
                    state,
                    jnp.asarray(feats_b),
                    jnp.asarray(masks_b),
                    jnp.asarray(labels_b),
                    jnp.asarray(lr, jnp.float32),
                    key,
                )
                l, s, ins = np.asarray(l), np.asarray(s), np.asarray(ins)
            else:
                fn = self.train_bucket_batched_fn(n_pad, batch)
                if self.mesh is not None:
                    from snuffy_tpu.parallel.sharded_train import shard_state

                    # idempotent placement: a no-op once the state already
                    # carries the mesh shardings (steps donate + preserve)
                    state = shard_state(state, self.mesh)
                l_parts, s_parts, ins_parts = [], [], []
                for start in range(0, len(idx), batch):
                    fb = feats_b[start:start + batch]
                    mb = masks_b[start:start + batch]
                    lb = labels_b[start:start + batch]
                    n_real = fb.shape[0]
                    if n_real < batch:  # pad with zero-weight dummy bags
                        pad = batch - n_real
                        fb = np.concatenate(
                            [fb, np.zeros((pad,) + fb.shape[1:], fb.dtype)]
                        )
                        mb = np.concatenate(
                            [mb, np.zeros((pad,) + mb.shape[1:], bool)]
                        )
                        lb = np.concatenate(
                            [lb, np.zeros((pad,) + lb.shape[1:], lb.dtype)]
                        )
                    bag_w = np.zeros((batch,), np.float32)
                    bag_w[:n_real] = 1.0
                    key, sub = jax.random.split(key)
                    if self.mesh is not None:
                        # multi-controller jit rejects raw numpy for
                        # sharded in_shardings; outputs shard over the
                        # batch axes and need an allgather to fetch
                        from snuffy_tpu.parallel.sharded_train import (
                            fetch_batch_outputs,
                            make_global_batch,
                        )

                        fb, mb, lb, bag_w = make_global_batch(
                            self.mesh, fb, mb, lb, bag_w
                        )
                    else:
                        fb, mb, lb, bag_w = map(
                            jnp.asarray, (fb, mb, lb, bag_w)
                        )
                    state, lg, sg, ig = fn(
                        state, fb, mb, lb, bag_w,
                        jnp.asarray(lr, jnp.float32), sub,
                    )
                    if self.mesh is not None:
                        lg, sg, ig = fetch_batch_outputs(lg, sg, ig)
                    l_parts.append(np.asarray(lg)[:n_real])
                    s_parts.append(np.asarray(sg)[:n_real])
                    ins_parts.append(np.asarray(ig)[:n_real])
                l = np.concatenate(l_parts)
                s = np.concatenate(s_parts)
                ins = np.concatenate(ins_parts)
            losses.append(l)
            scores.append(s)
            # Keep only valid instance rows, per bag (host-side ragged).
            for b in range(ins.shape[0]):
                n_valid = int(masks_b[b].sum())
                ins_list.append(ins[b, :n_valid])
            order.extend(idx.tolist())
        return (
            state,
            np.concatenate(losses),
            np.concatenate(scores),
            ins_list,
            np.asarray(order),
        )

    def run_eval_epoch(
        self,
        state: MILTrainState,
        bucketed: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]],
        seed: int,
    ):
        order, losses, scores, ins_list = [], [], [], []
        group = {"model": state.params, "w": state.w}
        for n_pad in sorted(bucketed.keys()):
            feats_b, masks_b, labels_b, idx = bucketed[n_pad]
            chunk = min(self.EVAL_CHUNK, len(idx))
            fn = self.eval_bucket_fn(n_pad, chunk)
            key = jax.random.PRNGKey(seed + n_pad)
            for start in range(0, len(idx), chunk):
                fb = feats_b[start:start + chunk]
                mb = masks_b[start:start + chunk]
                lb = labels_b[start:start + chunk]
                n_real = fb.shape[0]
                if n_real < chunk:  # masked dummy bags pad the tail chunk
                    pad = chunk - n_real
                    fb = np.concatenate(
                        [fb, np.zeros((pad,) + fb.shape[1:], fb.dtype)]
                    )
                    mb = np.concatenate(
                        [mb, np.zeros((pad,) + mb.shape[1:], bool)]
                    )
                    lb = np.concatenate(
                        [lb, np.zeros((pad,) + lb.shape[1:], lb.dtype)]
                    )
                key, sub = jax.random.split(key)
                l, s, ins = fn(
                    group,
                    jnp.asarray(fb),
                    jnp.asarray(mb),
                    jnp.asarray(lb),
                    sub,
                )
                losses.append(np.asarray(l)[:n_real])
                scores.append(np.asarray(s)[:n_real])
                ins = np.asarray(ins)
                for b in range(n_real):
                    n_valid = int(mb[b].sum())
                    ins_list.append(ins[b, :n_valid])
            order.extend(np.asarray(idx).tolist())
        return (
            np.concatenate(losses),
            np.concatenate(scores),
            ins_list,
            np.asarray(order),
        )
