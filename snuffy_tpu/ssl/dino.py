"""DINO-with-Adapter self-supervised trainer, TPU-native.

Rebuild of the reference DINO-adapter stage (reference
dino_adapter/main_dino_adapter.py; SURVEY.md §2.7):

  * student/teacher ViTs share one flax definition; `MultiCropWrapper`
    semantics (backbone per crop resolution, one DINOHead over concatenated
    CLS outputs, main_dino_adapter.py:228-237) are reproduced by
    `forward_views`;
  * DINOLoss with teacher-temperature warmup and center EMA
    (main_dino_adapter.py:618-671); the center all-reduce becomes a
    `psum`-free global mean: the batch axis is sharded over dp and XLA
    inserts the collective for `jnp.mean` automatically;
  * EMA teacher update on a cosine momentum schedule
    (main_dino_adapter.py:541-545);
  * adapter finetuning freeze — only adapter + head parameters receive
    updates (main_dino_adapter.py:307-314) — implemented as an optax mask,
    not Python mutation;
  * per-parameter gradient clipping and last-layer gradient cancelling
    (dino_adapter/utils.py:137-154);
  * replaces DDP/gloo with a dp-sharded jit step (SURVEY.md §2.14).

The whole step (augment → student/teacher forwards → loss → masked update →
EMA) is ONE jitted function with donated state.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from snuffy_tpu.models.vit import DINOHead, VisionTransformer
from snuffy_tpu.ssl.lars import lars


class DINOState(NamedTuple):
    student: Any          # {'backbone': ..., 'head': ...}
    teacher: Any          # same structure
    center: jnp.ndarray   # (1, out_dim)
    opt_state: Any
    step: jnp.ndarray
    # BatchNorm running stats for the heads when use_bn_in_head (reference
    # --use_bn_in_head, main_dino_adapter.py:91); empty dicts otherwise.
    bn_stats: Any = None


def is_trainable_path(path: Tuple[str, ...], freeze_backbone: bool) -> bool:
    """Adapter-finetuning freeze: head always trains; backbone only its
    adapter branches (reference main_dino_adapter.py:307-314 freezes params
    that were present in the loaded checkpoint — i.e. everything except the
    adapters, which are 'missing keys' — plus keeps the head)."""
    names = [str(p) for p in path]
    if names[0] == "head":
        return True
    if not freeze_backbone:
        return True
    return any("adaptmlp" in n for n in names)


def trainable_mask(params, freeze_backbone: bool):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: is_trainable_path(
            tuple(p.key if hasattr(p, "key") else str(p) for p in path),
            freeze_backbone,
        ),
        params,
    )


def clip_gradients_per_param(grads, clip: float):
    """DINO's per-parameter norm clip (reference dino_adapter/utils.py:137-146)."""

    def one(g):
        norm = jnp.linalg.norm(g)
        factor = jnp.minimum(1.0, clip / (norm + 1e-6))
        return g * factor

    return jax.tree_util.tree_map(one, grads)


def cancel_last_layer_grads(grads, epoch: int, freeze_last_layer: int):
    """Zero DINOHead last-layer grads during the first epochs (reference
    dino_adapter/utils.py:148-154)."""
    if epoch >= freeze_last_layer:
        return grads

    def zero_last(path, g):
        names = [str(p.key if hasattr(p, "key") else p) for p in path]
        if any("last_layer" in n for n in names):
            return jnp.zeros_like(g)
        return g

    return jax.tree_util.tree_map_with_path(zero_last, grads)


class DINOTrainer:
    def __init__(
        self,
        backbone: VisionTransformer,
        out_dim: int = 65536,
        warmup_teacher_temp: float = 0.04,
        teacher_temp: float = 0.04,
        warmup_teacher_temp_epochs: int = 0,
        student_temp: float = 0.1,
        center_momentum: float = 0.9,
        n_local_crops: int = 8,
        local_size: int = 96,
        global_size: int = 224,
        freeze_backbone: bool = True,
        freeze_last_layer: int = 1,
        clip_grad: Optional[float] = 3.0,
        norm_last_layer: bool = True,
        head_hidden_dim: int = 2048,
        head_bottleneck_dim: int = 256,
        optimizer: str = "adamw",
        use_bn_in_head: bool = False,
        crop_pack: int = 1,
    ):
        if optimizer not in ("adamw", "sgd", "lars"):
            raise KeyError(
                f"Optimizer not found. Given: {optimizer}, "
                "Have: ['adamw', 'sgd', 'lars']"
            )
        self.backbone = backbone
        self.head = DINOHead(
            out_dim=out_dim,
            hidden_dim=head_hidden_dim,
            bottleneck_dim=head_bottleneck_dim,
            norm_last_layer=norm_last_layer,
            use_bn=use_bn_in_head,
        )
        self.out_dim = out_dim
        self.student_temp = student_temp
        self.center_momentum = center_momentum
        self.n_local = n_local_crops
        self.local_size = local_size
        self.global_size = global_size
        self.freeze_backbone = freeze_backbone
        self.freeze_last_layer = freeze_last_layer
        self.clip_grad = clip_grad
        self.warmup_teacher_temp = warmup_teacher_temp
        self.teacher_temp = teacher_temp
        self.warmup_teacher_temp_epochs = warmup_teacher_temp_epochs
        self.optimizer = optimizer
        # Pack `crop_pack` local crops into ONE student sequence with a
        # block-diagonal attention mask (VisionTransformer pack=): same
        # math (tolerance-equal outputs, tests/test_ssl.py), but the
        # n=37 local-crop attention — the memory-bound half of the DINO
        # step (ROOFLINE.md §5) — runs at n=37·crop_pack. 1 disables.
        self.crop_pack = crop_pack
        self.tx: Optional[optax.GradientTransformation] = None
        self._step_fn = None
        self._eval_fn = None

    # ------------------------------------------------------------- building

    def teacher_temp_at(self, epoch: int) -> float:
        """Linear warmup then constant (reference main_dino_adapter.py:633-639)."""
        if epoch < self.warmup_teacher_temp_epochs:
            span = self.warmup_teacher_temp_epochs
            return self.warmup_teacher_temp + (
                self.teacher_temp - self.warmup_teacher_temp
            ) * epoch / span
        return self.teacher_temp

    def init_state(self, seed: int = 0) -> DINOState:
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        gdummy = jnp.zeros((1, self.global_size, self.global_size, 3))
        bb = self.backbone.init(k1, gdummy, True)["params"]
        cls = self.backbone.apply({"params": bb}, gdummy, True)
        head_vars = self.head.init(k2, cls)
        head = head_vars["params"]
        head_bn = head_vars.get("batch_stats", {})
        student = {"backbone": bb, "head": head}
        teacher = jax.tree_util.tree_map(jnp.copy, student)
        bn_stats = {
            "student": head_bn,
            "teacher": jax.tree_util.tree_map(jnp.copy, head_bn),
        }
        # Optimizer choice matches the reference's surface (reference
        # dino_adapter/main_dino_adapter.py:352-359): adamw for ViTs,
        # sgd (momentum 0.9) / LARS (utils.py:565-605) for convnets/large
        # batches. Scheduled weight decay is applied inside the step: adamw
        # decoupled, sgd/lars folded into the gradient pre-momentum.
        inner = {
            "adamw": optax.scale_by_adam(),
            "sgd": optax.trace(decay=0.9),
            "lars": lars(momentum=0.9, weight_decay=0.0),
        }[self.optimizer]
        self.tx = optax.masked(
            optax.chain(inner, optax.scale(-1.0)),
            trainable_mask(student, self.freeze_backbone),
        )
        opt_state = self.tx.init(student)
        return DINOState(
            student, teacher, jnp.zeros((1, self.out_dim)), opt_state,
            jnp.asarray(0, jnp.int32), bn_stats,
        )

    # ------------------------------------------------------------- forwards

    def forward_views(self, params, globals_, locals_, deterministic, rngs=None):
        """(2, B, gs, gs, 3) + (L, B, ls, ls, 3) → (2+L, B, out_dim).
        One backbone call per resolution (crops folded into the batch), one
        head call over everything — the MultiCropWrapper contract."""
        logits, _ = self.forward_views_bn(
            params, {}, globals_, locals_, deterministic, rngs=rngs
        )
        return logits

    def forward_views_bn(self, params, bn_stats, globals_, locals_,
                         deterministic, rngs=None, bn_train=None):
        """forward_views plus head BatchNorm handling: returns
        (logits (V, B, out_dim), updated batch_stats). `bn_train` decouples
        the head's BN mode from backbone dropout — the teacher runs its
        backbone deterministically but its BN on batch statistics, exactly
        like a torch module left in train() mode under no_grad."""
        if bn_train is None:
            bn_train = not deterministic

        def run(crops, pack=1):
            v, b = crops.shape[0], crops.shape[1]
            if (v * b) % pack:
                # Perf-only downgrade (math unchanged), but the CLI
                # contract says crop_pack must divide V×B — surface it
                # once instead of silently ignoring the flag (ADVICE r4).
                if not getattr(self, "_warned_pack_drop", False):
                    import warnings
                    warnings.warn(
                        f"crop_pack={pack} does not divide "
                        f"views*batch={v * b}; running unpacked (pack=1)",
                        stacklevel=2,
                    )
                    self._warned_pack_drop = True
                pack = 1
            flat = crops.reshape((v * b,) + crops.shape[2:])
            cls = self.backbone.apply(
                {"params": params["backbone"]}, flat, deterministic,
                rngs=rngs, pack=pack,
            )
            return cls.reshape(v, b, -1)

        outs = [run(globals_)]
        if locals_.shape[0] > 0:
            # Locals are the memory-bound n=37 regime — pack them.
            outs.append(run(locals_, self.crop_pack))
        cls_all = jnp.concatenate(outs, axis=0)  # (V, B, D)
        v, b, d = cls_all.shape
        head_vars = {"params": params["head"]}
        if bn_stats:
            head_vars["batch_stats"] = bn_stats
        if bn_stats and bn_train:
            logits, mut = self.head.apply(
                head_vars, cls_all.reshape(v * b, d), True,
                mutable=["batch_stats"],
            )
            bn_stats = mut["batch_stats"]
        else:
            logits = self.head.apply(head_vars, cls_all.reshape(v * b, d))
        return logits.reshape(v, b, self.out_dim), bn_stats

    def dino_loss(self, student_out, teacher_out, center, teacher_temp):
        """Cross-entropy between teacher (centered+sharpened, 2 global views)
        and student (all views), skipping same-view pairs
        (reference main_dino_adapter.py:641-663). Returns (loss, new_center)."""
        t = jax.nn.softmax((teacher_out - center[None]) / teacher_temp, axis=-1)
        t = jax.lax.stop_gradient(t)
        log_s = jax.nn.log_softmax(student_out / self.student_temp, axis=-1)

        n_views = student_out.shape[0]
        total, n_terms = 0.0, 0
        for iq in range(2):                 # teacher views
            for v in range(n_views):        # student views
                if v == iq:
                    continue
                total = total + jnp.mean(
                    -jnp.sum(t[iq] * log_s[v], axis=-1)
                )
                n_terms += 1
        loss = total / n_terms
        # Center EMA over the teacher batch; with B sharded over dp, XLA
        # all-reduces the mean (the dist.all_reduce of
        # main_dino_adapter.py:666-668).
        batch_center = jnp.mean(
            teacher_out.reshape(-1, self.out_dim), axis=0, keepdims=True
        )
        new_center = center * self.center_momentum + batch_center * (
            1 - self.center_momentum
        )
        return loss, new_center

    # ----------------------------------------------------------------- step

    def make_step(self, epoch_of_step: Callable[[int], int] = None):
        """Build the jitted train step:
        (state, globals, locals, lr, wd, momentum, teacher_temp, epoch, rng)
        → (state, loss)."""

        def step(state: DINOState, globals_, locals_, lr, wd, momentum,
                 teacher_temp, cancel_last, rng):
            k_drop, k_path = jax.random.split(rng)

            def loss_fn(student):
                s_out, bn_s = self.forward_views_bn(
                    student, state.bn_stats["student"], globals_, locals_,
                    False, rngs={"dropout": k_drop, "droppath": k_path},
                )
                # Teacher sees only the 2 global views
                # (reference main_dino_adapter.py:513-515); its head BN runs
                # on batch statistics (torch train-mode module under no_grad).
                t_out, bn_t = self.forward_views_bn(
                    jax.lax.stop_gradient(state.teacher),
                    state.bn_stats["teacher"], globals_, locals_[:0], True,
                    bn_train=True,
                )
                loss, new_center = self.dino_loss(
                    s_out, t_out, state.center, teacher_temp
                )
                return loss, (new_center, {"student": bn_s, "teacher": bn_t})

            (loss, (new_center, new_bn)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.student)
            new_bn = jax.lax.stop_gradient(new_bn)

            def cancel(gs):
                # cancel last-layer grads while cancel_last (traced 0/1
                # scalar; reference dino_adapter/utils.py:148-154)
                return jax.tree_util.tree_map_with_path(
                    lambda path, g: jnp.where(
                        cancel_last
                        & jnp.asarray(
                            any(
                                "last_layer" in str(
                                    p.key if hasattr(p, "key") else p
                                )
                                for p in path
                            )
                        ),
                        jnp.zeros_like(g),
                        g,
                    ),
                    gs,
                )

            if self.clip_grad:  # 0 disables clipping (reference flag help)
                grads = clip_gradients_per_param(grads, self.clip_grad)
            grads = cancel(grads)

            if self.optimizer in ("sgd", "lars"):
                # torch folds L2 decay into the gradient before the momentum
                # buffer (SGD) / trust ratio (LARS utils.py:586-588); only
                # multi-dim params are regularized (get_params_groups,
                # utils.py:648-659 + the LARS ndim!=1 filter).
                grads = jax.tree_util.tree_map(
                    lambda g, p: g + wd * p if p.ndim > 1 else g,
                    grads, state.student,
                )
                # Re-cancel after the fold: torch sets grad=None, so a
                # frozen last layer feeds NOTHING into the momentum/trust
                # buffers — without this, wd·p would accumulate there during
                # the freeze epochs and skew the first unfrozen steps.
                grads = cancel(grads)

            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.student)
            mask = trainable_mask(state.student, self.freeze_backbone)

            def apply_update(path, p, u, m):
                names = [str(pp.key if hasattr(pp, "key") else pp)
                         for pp in path]
                new = p + lr * u  # updates already carry −1 scale
                # AdamW decoupled decay skips every 1-d param (DINO
                # get_params_groups exempts biases AND anything with
                # ndim ≤ 1 — incl. last_layer_g, cls_token scalars —
                # reference dino_adapter/utils.py:648-659); sgd/lars already
                # folded wd into the gradient above.
                if self.optimizer == "adamw" and p.ndim > 1:
                    new = new - lr * wd * p
                if any("last_layer" in n for n in names):
                    # Cancelled last layer is skipped entirely — torch sets
                    # grad=None so AdamW neither steps nor decays it
                    # (reference dino_adapter/utils.py:148-154).
                    new = jnp.where(cancel_last, p, new)
                return jnp.where(m, new, p)

            new_student = jax.tree_util.tree_map_with_path(
                apply_update, state.student, updates, mask,
            )
            new_teacher = jax.tree_util.tree_map(
                lambda t, s: t * momentum + s * (1.0 - momentum),
                state.teacher, new_student,
            )
            return (
                DINOState(new_student, new_teacher, new_center, opt_state,
                          state.step + 1, new_bn),
                loss,
            )

        return jax.jit(step, donate_argnums=(0,))

    def get_step(self):
        if self._step_fn is None:
            self._step_fn = self.make_step()
        return self._step_fn

    def eval_loss(self, state: DINOState, globals_, locals_, teacher_temp
                  ) -> float:
        """Deterministic DINO loss on held-out crops (the reference's
        per-epoch validation pass, main_dino_adapter.py:567-594); head BN
        (if any) uses the running averages. Jitted: the eval forward must
        go through XLA, not eager op-by-op dispatch — eager dispatch of
        dp-sharded crops (the CLI's multi-chip valid path) aborted the
        CPU client, and jit is what handles sharded operands anyway."""
        if self._eval_fn is None:

            def run(state, g, l, temp):
                bn = state.bn_stats or {"student": {}, "teacher": {}}
                s_out, _ = self.forward_views_bn(
                    state.student, bn["student"], g, l, True
                )
                t_out, _ = self.forward_views_bn(
                    state.teacher, bn["teacher"], g, l[:0], True
                )
                loss, _ = self.dino_loss(s_out, t_out, state.center, temp)
                return loss

            self._eval_fn = jax.jit(run)
        return float(self._eval_fn(
            state, globals_, locals_, jnp.asarray(teacher_temp, jnp.float32)
        ))
