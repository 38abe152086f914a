"""Cross-framework parity: PyTorch-format ResNet weights into the Flax
backbone (torchvision state_dict naming; torch is the oracle)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from embeddingnet_tpu.models import pretrained  # noqa: E402
from embeddingnet_tpu.models.resnet import resnet18, resnet50  # noqa: E402

pytestmark = pytest.mark.parity

nn = torch.nn


class TorchBasicBlock(nn.Module):
    """torchvision BasicBlock, faithfully (conv names included)."""

    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.relu = nn.ReLU()

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchBottleneck(nn.Module):
    """torchvision Bottleneck (v1.5: stride on the 3x3)."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample
        self.relu = nn.ReLU()

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet(nn.Module):
    def __init__(self, block, layers):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0], 1)
        self.layer2 = self._make_layer(block, 128, layers[1], 2)
        self.layer3 = self._make_layer(block, 256, layers[2], 2)
        self.layer4 = self._make_layer(block, 512, layers[3], 2)

    def _make_layer(self, block, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1,
                          stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion))
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


@pytest.mark.parametrize("arch,block,layers,builder", [
    ("resnet18", TorchBasicBlock, [2, 2, 2, 2], resnet18),
    ("resnet50", TorchBottleneck, [3, 4, 6, 3], resnet50),
])
def test_torch_resnet_parity(arch, block, layers, builder):
    torch.manual_seed(0)
    tmodel = TorchResNet(block, layers).eval()
    # randomize BN stats so inference-mode normalization is non-trivial
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.6, 1.4)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)))).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))  # NCHW -> NHWC

    params, stats = pretrained.torch_resnet_to_flax(
        tmodel.state_dict(), layers)
    module = builder(stride_in_3x3=True, use_bias=False, bn_epsilon=1e-5)
    out = np.asarray(module.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        train=False))

    assert out.shape == ref.shape
    # north-star parity: the earlier 2e-3 tolerance was slack, not error —
    # the ported stacks are float-exact (measured 3.7e-7 max abs at 64px)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_converter_rejects_missing_keys():
    with pytest.raises(KeyError):
        pretrained.torch_resnet_to_flax({"conv1.weight":
                                         np.zeros((64, 3, 7, 7))},
                                        [2, 2, 2, 2])
