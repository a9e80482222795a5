"""ResNet golden test: flax ResNet == a torch reference ResNet with converted
weights (torchvision is not installed here, so the torch side is built from
torch.nn directly with torchvision's exact structure/naming)."""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from vampire_tpu.models.resnet import ResNet
from vampire_tpu.utils.torch_weights import convert_torchvision_resnet


class TorchBasicBlock(tnn.Module):
    def __init__(self, inp, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or inp != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes))

    def forward(self, x):
        idt = x
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return torch.relu(out + idt)


class TorchResNet18(tnn.Module):
    """torchvision-compatible naming for state_dict conversion."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        chans = [64, 128, 256, 512]
        inp = 64
        for i, c in enumerate(chans):
            stride = 1 if i == 0 else 2
            blocks = [TorchBasicBlock(inp, c, stride), TorchBasicBlock(c, c)]
            setattr(self, f'layer{i + 1}', tnn.Sequential(*blocks))
            inp = c

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        outs = []
        for i in range(4):
            x = getattr(self, f'layer{i + 1}')(x)
            outs.append(x)
        return outs


def _torch_sd_to_tv_names(model):
    """Rename 'layerX.N.downsample.0' etc to match torchvision keys
    (they already match by construction here)."""
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


class TorchBottleneck(tnn.Module):
    """torchvision Bottleneck: stride in the 3x3 (pytorch-style)."""

    def __init__(self, inp, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, planes, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride != 1 or inp != planes * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        idt = x
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return torch.relu(out + idt)


class TorchResNet50(tnn.Module):
    """torchvision-compatible structure/naming for the flagship's pretrained
    R50 init (base_exp.py:73). Built from torch.nn because torchvision isn't
    installed here; the state_dict keys match torchvision's exactly."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        stage_blocks = (3, 4, 6, 3)
        inp = 64
        for i, nb in enumerate(stage_blocks):
            planes = 64 * (2 ** i)
            stride = 1 if i == 0 else 2
            blocks = [TorchBottleneck(inp, planes, stride)]
            inp = planes * 4
            blocks += [TorchBottleneck(inp, planes) for _ in range(nb - 1)]
            setattr(self, f'layer{i + 1}', tnn.Sequential(*blocks))

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        outs = []
        for i in range(4):
            x = getattr(self, f'layer{i + 1}')(x)
            outs.append(x)
        return outs


def test_resnet50_bottleneck_matches_torch():
    """The conversion path the flagship actually needs: torchvision R50
    (Bottleneck) state dict -> flax params, verified numerically."""
    torch.manual_seed(0)
    tmodel = TorchResNet50().eval()
    sd = _torch_sd_to_tv_names(tmodel)
    params, stats = convert_torchvision_resnet(sd, depth=50)

    fmodel = ResNet(depth=50, dtype=jnp.float32)
    x = np.random.RandomState(2).randn(1, 64, 64, 3).astype(np.float32)
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    got_tree_p = jax.tree.map(lambda a: a.shape, variables['params'])
    want_tree_p = jax.tree.map(lambda a: np.asarray(a).shape, params)
    assert got_tree_p == want_tree_p, 'converted param structure mismatch'
    outs = jax.jit(lambda p, s, xx: fmodel.apply(
        {'params': p, 'batch_stats': s}, xx, False))(
            jax.tree.map(jnp.asarray, params),
            jax.tree.map(jnp.asarray, stats), jnp.asarray(x))

    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    for o, w in zip(outs, want):
        np.testing.assert_allclose(np.asarray(o),
                                   w.permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-3, atol=1e-4)


def test_resnet18_matches_torch():
    torch.manual_seed(0)
    tmodel = TorchResNet18().eval()
    sd = _torch_sd_to_tv_names(tmodel)
    params, stats = convert_torchvision_resnet(sd, depth=18)

    fmodel = ResNet(depth=18, dtype=jnp.float32)
    x = np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32)
    # init to get the full variable structure, then graft converted weights
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    got_tree_p = jax.tree.map(lambda a: a.shape, variables['params'])
    want_tree_p = jax.tree.map(lambda a: np.asarray(a).shape, params)
    assert got_tree_p == want_tree_p, 'converted param structure mismatch'
    outs = jax.jit(lambda p, s, xx: fmodel.apply(
        {'params': p, 'batch_stats': s}, xx, False))(
            jax.tree.map(jnp.asarray, params),
            jax.tree.map(jnp.asarray, stats), jnp.asarray(x))

    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    for o, w in zip(outs, want):
        np.testing.assert_allclose(np.asarray(o),
                                   w.permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-3, atol=1e-4)
