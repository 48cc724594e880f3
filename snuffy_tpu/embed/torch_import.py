"""PyTorch `.pth` checkpoint → flax parameter trees.

The reference loads published DINO/MAE/SimCLR checkpoints with per-embedder
key remapping (reference compute_feats.py:449-518: prefix stripping,
`check_layers` shape audits, positional key re-zipping for the DSMIL-SimCLR
weights). Here the same remappings are implemented as pure functions
torch-state-dict → nested flax dicts.

Weight layout conversions (torch → flax):
  Linear  (out, in)        → kernel (in, out)           [transpose]
  Conv2d  (out, in, kh, kw)→ kernel (kh, kw, in, out)   [transpose 2,3,1,0]
  LayerNorm weight/bias    → scale/bias
  BatchNorm weight/bias/running_mean/running_var → scale/bias/mean/var
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load on CPU → {key: np.ndarray}. Unwraps common containers
    ('state_dict', 'model', 'teacher', 'student') like the reference
    loaders do (compute_feats.py:449-483)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for container in ("state_dict", "model", "teacher"):
        if isinstance(ckpt, dict) and container in ckpt and isinstance(
            ckpt[container], dict
        ):
            ckpt = ckpt[container]
            break
    return {
        k: v.detach().cpu().numpy()
        for k, v in ckpt.items()
        if hasattr(v, "detach")
    }


def strip_prefixes(sd: Dict[str, np.ndarray], prefixes=("module.", "backbone.")):
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
        out[k] = v
    return out


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _linear(tree, flax_path, sd, torch_key):
    _set(tree, flax_path + ("kernel",), sd[f"{torch_key}.weight"].T)
    if f"{torch_key}.bias" in sd:
        _set(tree, flax_path + ("bias",), sd[f"{torch_key}.bias"])


def _conv(tree, flax_path, sd, torch_key):
    _set(tree, flax_path + ("kernel",),
         sd[f"{torch_key}.weight"].transpose(2, 3, 1, 0))
    if f"{torch_key}.bias" in sd:
        _set(tree, flax_path + ("bias",), sd[f"{torch_key}.bias"])


def _layernorm(tree, flax_path, sd, torch_key):
    _set(tree, flax_path + ("scale",), sd[f"{torch_key}.weight"])
    _set(tree, flax_path + ("bias",), sd[f"{torch_key}.bias"])


def _maybe_adapter(tree, block_path, sd, torch_prefix):
    if f"{torch_prefix}.adaptmlp.down_proj.weight" not in sd:
        return
    ad = block_path + ("adaptmlp",)
    _linear(tree, ad + ("down",), sd, f"{torch_prefix}.adaptmlp.down_proj")
    _linear(tree, ad + ("up",), sd, f"{torch_prefix}.adaptmlp.up_proj")
    if f"{torch_prefix}.adaptmlp.scale" in sd:
        _set(tree, ad + ("scale",), sd[f"{torch_prefix}.adaptmlp.scale"])
    if f"{torch_prefix}.adaptmlp.adapter_layer_norm_before.weight" in sd:
        _layernorm(tree, ad + ("ln",), sd,
                   f"{torch_prefix}.adaptmlp.adapter_layer_norm_before")


def _vit_block(tree, sd, torch_prefix: str, flax_name: str):
    bp = (flax_name,)
    _layernorm(tree, bp + ("norm1",), sd, f"{torch_prefix}.norm1")
    _linear(tree, bp + ("attn", "qkv"), sd, f"{torch_prefix}.attn.qkv")
    _linear(tree, bp + ("attn", "proj"), sd, f"{torch_prefix}.attn.proj")
    _layernorm(tree, bp + ("norm2",), sd, f"{torch_prefix}.norm2")
    _linear(tree, bp + ("mlp", "fc1"), sd, f"{torch_prefix}.mlp.fc1")
    _linear(tree, bp + ("mlp", "fc2"), sd, f"{torch_prefix}.mlp.fc2")
    _maybe_adapter(tree, bp, sd, torch_prefix)


def import_vit(sd: Dict[str, np.ndarray]) -> dict:
    """DINO-style ViT (± adapter) → params for models.vit.VisionTransformer."""
    sd = strip_prefixes(sd)
    tree: dict = {}
    _set(tree, ("cls_token",), sd["cls_token"])
    _set(tree, ("pos_embed",), sd["pos_embed"])
    _conv(tree, ("patch_embed", "proj"), sd, "patch_embed.proj")
    depth = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"blocks\.(\d+)\.", k))
    )
    for i in range(depth):
        _vit_block(tree, sd, f"blocks.{i}", f"blocks_{i}")
    if "norm.weight" in sd:
        _layernorm(tree, ("norm",), sd, "norm")
    return tree


def import_mae(sd: Dict[str, np.ndarray]) -> dict:
    """MAE (± adapter) → params for models.mae.MaskedAutoencoderViT.
    Decoder keys are imported when present; feature extraction only needs
    the encoder (the reference deletes the decoder, compute_feats.py:344)."""
    sd = strip_prefixes(sd)
    tree: dict = {}
    _set(tree, ("cls_token",), sd["cls_token"])
    _conv(tree, ("patch_embed", "proj"), sd, "patch_embed.proj")
    depth = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"blocks\.(\d+)\.", k))
    )
    for i in range(depth):
        _vit_block(tree, sd, f"blocks.{i}", f"blocks_{i}")
    _layernorm(tree, ("norm",), sd, "norm")
    if "mask_token" in sd:
        _set(tree, ("mask_token",), sd["mask_token"])
    if "decoder_embed.weight" in sd:
        _linear(tree, ("decoder_embed",), sd, "decoder_embed")
        dec_depth = 1 + max(
            int(m.group(1))
            for k in sd
            if (m := re.match(r"decoder_blocks\.(\d+)\.", k))
        )
        for i in range(dec_depth):
            _vit_block(tree, sd, f"decoder_blocks.{i}", f"decoder_blocks_{i}")
        _layernorm(tree, ("decoder_norm",), sd, "decoder_norm")
        _linear(tree, ("decoder_pred",), sd, "decoder_pred")
    return tree


def load_torch_full_checkpoint(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Full DINO training checkpoint {'student': sd, 'teacher': sd, ...} →
    {'student': {k: np.ndarray}, 'teacher': ...} (reference
    dino_adapter/main_dino_adapter.py:239-243). Parts absent from the file
    are absent from the result."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out = {}
    for part in ("student", "teacher"):
        if isinstance(ckpt, dict) and isinstance(ckpt.get(part), dict):
            out[part] = {
                k: v.detach().cpu().numpy()
                for k, v in ckpt[part].items()
                if hasattr(v, "detach")
            }
    return out


# torch DINOHead Sequential indices → flax DINOHead module names
# (GELUs sit at mlp.1 / mlp.3; reference
# dino_adapter/vision_transformer_with_adapter.py:287-297).
_DINO_HEAD_MLP = {"mlp.0": "mlp_0", "mlp.2": "mlp_1", "mlp.4": "mlp_2"}
# use_bn_in_head layout: Linear/BN/GELU triplets (reference :289-294).
_DINO_HEAD_MLP_BN = {"mlp.0": "mlp_0", "mlp.3": "mlp_1", "mlp.6": "mlp_2"}
_DINO_HEAD_BN = {"mlp.1": "bn_0", "mlp.4": "bn_1"}


def import_dino_head(sd: Dict[str, np.ndarray], template: dict,
                     random_head: bool = False) -> dict:
    """DINOHead torch keys ('head.' prefix stripped) → flax params, with the
    reference's full-checkpoint filtering (main_dino_adapter.py:246-305):

      * any head tensor whose shape disagrees with the target model is
        dropped (e.g. different out_dim), as is everything when
        `random_head` — dropped keys keep their init values;
      * weight-norm mapping: last_layer.weight_v (out,in) → last_layer_v
        (in,out); weight_g (out,1) → last_layer_g (out,); a plain
        last_layer.weight is treated as weight_v (the vit_base published
        checkpoint case, main_dino_adapter.py:253-254,283-288) and weight_g
        keeps the template's value.
    """
    tree: dict = {}

    def try_set(flax_path: Tuple[str, ...], arr: np.ndarray):
        node = template
        for p in flax_path:
            if not isinstance(node, dict) or p not in node:
                return
            node = node[p]
        if random_head or tuple(np.shape(node)) != tuple(arr.shape):
            return
        _set(tree, flax_path, arr)

    # BN-equipped heads shift the Linear indices to 0/3/6 (use_bn_in_head);
    # detect by the presence of a running_mean key. BN running stats live in
    # flax's batch_stats collection, not params — they restart from init
    # (zeros/ones) on import; scale/bias map normally.
    use_bn = any(k.endswith("running_mean") for k in sd)
    mlp_map = _DINO_HEAD_MLP_BN if use_bn else _DINO_HEAD_MLP
    for tk, fk in mlp_map.items():
        if f"{tk}.weight" in sd:
            try_set((fk, "kernel"), sd[f"{tk}.weight"].T)
        if f"{tk}.bias" in sd:
            try_set((fk, "bias"), sd[f"{tk}.bias"])
    if use_bn:
        for tk, fk in _DINO_HEAD_BN.items():
            if f"{tk}.weight" in sd:
                try_set((fk, "scale"), sd[f"{tk}.weight"])
            if f"{tk}.bias" in sd:
                try_set((fk, "bias"), sd[f"{tk}.bias"])
    v = sd.get("last_layer.weight_v")
    if v is None:
        v = sd.get("last_layer.weight")
    if v is not None:
        try_set(("last_layer_v",), v.T)
    if "last_layer.weight_g" in sd and "last_layer.weight_v" in sd:
        try_set(("last_layer_g",), sd["last_layer.weight_g"].reshape(-1))
    return tree


def import_dino_student_teacher(
    parts: Dict[str, Dict[str, np.ndarray]],
    student_template: dict,
    teacher_template: dict,
    random_head: bool = False,
) -> Dict[str, dict]:
    """Full-checkpoint continue-pretraining load: backbone + filtered head
    for both networks, merged strict=False onto the init templates
    (reference main_dino_adapter.py:239-311)."""
    out = {}
    for name, template in (("student", student_template),
                           ("teacher", teacher_template)):
        sd = parts.get(name)
        if sd is None:
            continue
        sd = {k[len("module."):] if k.startswith("module.") else k: v
              for k, v in sd.items()}
        backbone_sd = {k[len("backbone."):]: v for k, v in sd.items()
                       if k.startswith("backbone.")}
        head_sd = {k[len("head."):]: v for k, v in sd.items()
                   if k.startswith("head.")}
        tree: dict = {}
        if backbone_sd:
            tree["backbone"] = import_vit(backbone_sd)
        if head_sd:
            tree["head"] = import_dino_head(
                head_sd, template.get("head", {}), random_head
            )
        out[name] = merge_into(template, tree)
    return out


def import_resnet18(sd: Dict[str, np.ndarray], norm: str = "instance") -> dict:
    """torchvision resnet18 state dict → params for models.resnet.ResNet18.

    With InstanceNorm there are no norm parameters; with BatchNorm the
    running stats become FrozenBatchNorm params.
    """
    sd = strip_prefixes(sd)
    tree: dict = {}

    def bn(flax_path, torch_key):
        if f"{torch_key}.weight" not in sd:
            return
        _set(tree, flax_path + ("scale",), sd[f"{torch_key}.weight"])
        _set(tree, flax_path + ("bias",), sd[f"{torch_key}.bias"])
        _set(tree, flax_path + ("mean",), sd[f"{torch_key}.running_mean"])
        _set(tree, flax_path + ("var",), sd[f"{torch_key}.running_var"])

    _conv(tree, ("conv1",), sd, "conv1")
    bn(("bn1",), "bn1")
    for li in range(1, 5):
        for bi in range(2):
            tp = f"layer{li}.{bi}"
            fp = (f"layer{li}_{bi}",)
            _conv(tree, fp + ("conv1",), sd, f"{tp}.conv1")
            _conv(tree, fp + ("conv2",), sd, f"{tp}.conv2")
            bn(fp + ("bn1",), f"{tp}.bn1")
            bn(fp + ("bn2",), f"{tp}.bn2")
            if f"{tp}.downsample.0.weight" in sd:
                _conv(tree, fp + ("downsample_conv",), sd, f"{tp}.downsample.0")
                bn(fp + ("downsample_bn",), f"{tp}.downsample.1")
    return tree


def import_resnet50(sd: Dict[str, np.ndarray]) -> dict:
    """torchvision resnet50 state dict → params for models.resnet.ResNet50
    (the DINO ResNet-50 release layout, reference
    dino_adapter/hubconf.py:84-99). Running BN stats → FrozenBatchNorm."""
    sd = strip_prefixes(sd)
    tree: dict = {}

    def bn(flax_path, torch_key):
        if f"{torch_key}.weight" not in sd:
            return
        _set(tree, flax_path + ("scale",), sd[f"{torch_key}.weight"])
        _set(tree, flax_path + ("bias",), sd[f"{torch_key}.bias"])
        _set(tree, flax_path + ("mean",), sd[f"{torch_key}.running_mean"])
        _set(tree, flax_path + ("var",), sd[f"{torch_key}.running_var"])

    _conv(tree, ("conv1",), sd, "conv1")
    bn(("bn1",), "bn1")
    for li, blocks in enumerate((3, 4, 6, 3), start=1):
        for bi in range(blocks):
            tp = f"layer{li}.{bi}"
            fp = (f"layer{li}_{bi}",)
            for c in ("conv1", "conv2", "conv3"):
                _conv(tree, fp + (c,), sd, f"{tp}.{c}")
            for b in ("bn1", "bn2", "bn3"):
                bn(fp + (b,), f"{tp}.{b}")
            if f"{tp}.downsample.0.weight" in sd:
                _conv(tree, fp + ("downsample_conv",), sd,
                      f"{tp}.downsample.0")
                bn(fp + ("downsample_bn",), f"{tp}.downsample.1")
    return tree


def positional_rezip(sd: Dict[str, np.ndarray],
                     template: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """DSMIL-SimCLR weights ship under foreign key names; the reference
    re-zips values onto the target model's key order positionally
    (compute_feats.py:493-518). Shapes must match pairwise."""
    values = list(sd.values())
    keys = list(template.keys())
    if len(values) != len(keys):
        raise ValueError(
            f"positional rezip needs equal counts: {len(values)} vs {len(keys)}"
        )
    out = {}
    for k, v in zip(keys, values):
        if tuple(template[k].shape) != tuple(v.shape):
            raise ValueError(
                f"shape mismatch at {k}: {template[k].shape} vs {v.shape}"
            )
        out[k] = v
    return out


def check_layers(imported: dict, target_template: dict) -> Tuple[list, list]:
    """Shape audit like the reference's check_layers tables
    (reference utils.py:352-422): returns (matched, mismatched) leaf paths."""
    import jax

    matched, mismatched = [], []

    flat_imp = {
        "/".join(str(p.key) for p in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(imported)[0]
    }
    flat_tgt = {
        "/".join(str(p.key) for p in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(target_template)[0]
    }
    for k, v in flat_tgt.items():
        if k in flat_imp and tuple(flat_imp[k].shape) == tuple(v.shape):
            matched.append(k)
        else:
            mismatched.append(k)
    return matched, mismatched


def merge_into(template: dict, imported: dict) -> dict:
    """Overlay imported leaves onto an init template (missing keys keep their
    init values — the reference's strict=False load)."""
    if not isinstance(template, dict):
        return imported if imported is not None else template
    out = {}
    for k, v in template.items():
        sub = imported.get(k) if isinstance(imported, dict) else None
        out[k] = merge_into(v, sub) if sub is not None else v
    return out
