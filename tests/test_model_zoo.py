"""Model-zoo registry breadth (reference dino_adapter/hubconf.py:22-151).

The DINO ResNet-50 entry is a torchvision resnet50 with fc→Identity; no
torchvision in this image, so the oracle here is a compact torch
reimplementation in the exact torchvision module layout (attribute names →
state-dict keys match torchvision's, so `import_resnet50` sees the real
checkpoint schema)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


class _TorchBottleneck(torch.nn.Module):
    # torchvision.models.resnet.Bottleneck layout (expansion = 4)
    def __init__(self, cin, width, stride):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(width)
        self.conv2 = torch.nn.Conv2d(width, width, 3, stride=stride,
                                     padding=1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(width)
        self.conv3 = torch.nn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(width * 4)
        self.relu = torch.nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or cin != width * 4:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, width * 4, 1, stride=stride,
                                bias=False),
                torch.nn.BatchNorm2d(width * 4),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


class _TorchResNet50(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, stride=2, padding=3,
                                     bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.relu = torch.nn.ReLU(inplace=True)
        self.maxpool = torch.nn.MaxPool2d(3, stride=2, padding=1)
        plan = [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
        cin = 64
        for li, (width, blocks, stride) in enumerate(plan, start=1):
            mods = []
            for bi in range(blocks):
                mods.append(_TorchBottleneck(cin, width,
                                             stride if bi == 0 else 1))
                cin = width * 4
            setattr(self, f"layer{li}", torch.nn.Sequential(*mods))

    def forward(self, x):
        y = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(1, 5):
            y = getattr(self, f"layer{li}")(y)
        return y.mean(dim=(2, 3))


def _randomize_bn_stats(model, rng):
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(
                torch.from_numpy(rng.normal(0, 0.5, m.num_features)
                                 .astype(np.float32)))
            m.running_var.copy_(
                torch.from_numpy(rng.uniform(0.5, 2.0, m.num_features)
                                 .astype(np.float32)))


def test_resnet50_import_parity():
    """flax ResNet50 == the torchvision-layout torch oracle on random
    weights + random running stats (validates conv padding, maxpool, BN
    eval semantics, bottleneck wiring, and the import key mapping)."""
    import jax
    import jax.numpy as jnp

    from snuffy_tpu.embed import torch_import as ti
    from snuffy_tpu.models.resnet import ResNet50

    torch.manual_seed(0)
    tmodel = _TorchResNet50().eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, np.random.default_rng(1))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    # the real checkpoint schema has these exact keys
    assert "layer1.0.downsample.0.weight" in sd
    assert "layer4.2.bn3.running_var" in sd

    model = ResNet50(norm="batch")
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)))["params"]
    imported = ti.import_resnet50(sd)
    merged = ti.merge_into(params, imported)

    x = np.random.default_rng(2).normal(0, 1, (2, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(model.apply({"params": merged}, jnp.asarray(x)))
    assert out.shape == (2, 2048)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-3)


def test_resnet50_import_covers_all_params():
    """Every flax param leaf is overwritten by the import (no silently
    random-initialized leaves left behind)."""
    import jax
    import jax.numpy as jnp

    from snuffy_tpu.embed import torch_import as ti
    from snuffy_tpu.models.resnet import ResNet50

    tmodel = _TorchResNet50()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    model = ResNet50(norm="batch")
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    imported = ti.import_resnet50(sd)
    matched, mismatched = ti.check_layers(imported, params)
    assert not mismatched
    assert len(matched) == len(
        __import__("jax").tree_util.tree_leaves(params))


def test_hubconf_registry_breadth():
    """All reference hub entries are registered (reference
    dino_adapter/hubconf.py:22-151) and missing weights raise with the
    official URL."""
    import hubconf

    for name in ("dino_vits16", "dino_vits8", "dino_vitb16", "dino_vitb8",
                 "dino_resnet50", "dino_xcit_small_12_p16",
                 "dino_xcit_small_12_p8", "dino_xcit_medium_24_p16",
                 "dino_xcit_medium_24_p8"):
        assert name in hubconf.DINO_CHECKPOINTS
    with pytest.raises(FileNotFoundError, match="dl.fbaipublicfiles"):
        hubconf.load_dino_resnet50(weights_dir="/nonexistent")
