"""Export a trained Snuffy MILNet back to the reference's .pth format.

Checkpoint interop is two-way: `torch_import.py` brings the published
PyTorch weights in; this module takes OUR trained aggregator back out as
a state dict the reference loads with `strict=True`
(reference snuffy.py module tree: i_classifier.fc.0 / b_classifier.
encoder.layers.{i}.self_attn.linears.{0..3} / feed_forward.w_{1,2} /
sublayer.{0,1}.norm / encoder.norm / b_classifier.linear — the exact
inverse of tests/test_reference_parity.py:snuffy_ref_to_flax). A user of
the reference can train here and keep serving/evaluating there
(reference train.py:620-641 load path, roi.py:297-315).

Flax kernels are (in, out); torch Linear weights are (out, in) — every
kernel transposes on the way out.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def export_milnet(params: dict) -> Dict[str, np.ndarray]:
    """Flax MILNet param tree → reference-keyed numpy state dict."""
    sd: Dict[str, np.ndarray] = {}
    fc = params["i_classifier"]["fc"]
    sd["i_classifier.fc.0.weight"] = _np(fc["kernel"]).T
    sd["i_classifier.fc.0.bias"] = _np(fc["bias"])

    bc = params["b_classifier"]
    enc = bc["encoder"]
    names = ["wq", "wk", "wv", "wo"]
    depth = sum(1 for k in enc if k.startswith("layer_"))
    for i in range(depth):
        layer = enc[f"layer_{i}"]
        p = f"b_classifier.encoder.layers.{i}"
        for j, nm in enumerate(names):
            sd[f"{p}.self_attn.linears.{j}.weight"] = _np(
                layer["attn"][nm]["kernel"]).T
            sd[f"{p}.self_attn.linears.{j}.bias"] = _np(
                layer["attn"][nm]["bias"])
        sd[f"{p}.feed_forward.w_1.weight"] = _np(layer["ff"]["w1"]["kernel"]).T
        sd[f"{p}.feed_forward.w_1.bias"] = _np(layer["ff"]["w1"]["bias"])
        sd[f"{p}.feed_forward.w_2.weight"] = _np(layer["ff"]["w2"]["kernel"]).T
        sd[f"{p}.feed_forward.w_2.bias"] = _np(layer["ff"]["w2"]["bias"])
        sd[f"{p}.sublayer.0.norm.weight"] = _np(layer["ln_attn"]["scale"])
        sd[f"{p}.sublayer.0.norm.bias"] = _np(layer["ln_attn"]["bias"])
        sd[f"{p}.sublayer.1.norm.weight"] = _np(layer["ln_ff"]["scale"])
        sd[f"{p}.sublayer.1.norm.bias"] = _np(layer["ln_ff"]["bias"])
    sd["b_classifier.encoder.norm.weight"] = _np(enc["ln_final"]["scale"])
    sd["b_classifier.encoder.norm.bias"] = _np(enc["ln_final"]["bias"])
    sd["b_classifier.linear.weight"] = _np(bc["linear"]["kernel"]).T
    sd["b_classifier.linear.bias"] = _np(bc["linear"]["bias"])
    return sd


def save_milnet_pth(
    params: dict,
    path: str,
    single_weight_parameter: Optional[float] = None,
) -> Dict[str, np.ndarray]:
    """Write the reference-format .pth (torch.save of the state dict —
    reference Runner._save_epoch_model, train.py:643-675; the learnable
    loss-mix scalar rides in its reference side file name convention when
    given). Returns the exported numpy dict."""
    import torch

    sd = export_milnet(params)
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, path)
    if single_weight_parameter is not None:
        torch.save(
            torch.tensor(float(single_weight_parameter)),
            path.replace(".pth", "") + "_single_weight_parameter.pth",
        )
    return sd
