"""Golden weight-conversion tests: REAL torch serialization + forward parity.

VERDICT r3 flagged that ``models/weights.py`` had only been validated against
fabricated numpy dicts, never against torch's real serialization format or an
end-to-end forward pass. torchvision is not installed in this env, so these
tests define faithful torch.nn twins of torchvision's resnet18 / vgg16
architectures (same state_dict key names, same forward math as
``torchvision.models.resnet.ResNet`` / ``.vgg.VGG``), randomize them
(including non-trivial BN running stats via a few training-mode passes),
``torch.save`` the real state_dict, convert via ``load_pretrained_backbone``,
and require logits parity between torch eval and our Flax forward.

This pins every conversion rule end to end: OIHW->HWIO, (out,in)->(in,out),
BN stats mapping, downsample naming, and the NCHW-vs-NHWC flatten order of
the first VGG classifier layer (reference loads these weights at
``model/backbone/resnet.py:16-26`` / ``model/backbone/vgg.py:189-190``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
tnn = torch.nn

import hawkeye_tpu.models  # noqa: F401,E402
from hawkeye_tpu.models.weights import load_pretrained_backbone  # noqa: E402
from hawkeye_tpu.registry import BACKBONE  # noqa: E402


class _TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + idt)


class _TorchResNet18(tnn.Module):
    """torchvision-resnet18-named twin (state_dict keys match exactly)."""

    def __init__(self, num_classes=10):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = 64
        for li, c in enumerate([64, 128, 256, 512], start=1):
            blocks = []
            for bj in range(2):
                stride = 2 if (li > 1 and bj == 0) else 1
                blocks.append(_TorchBasicBlock(cin if bj == 0 else c, c, stride))
            setattr(self, f"layer{li}", tnn.Sequential(*blocks))
            cin = c
        self.fc = tnn.Linear(512, num_classes)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        return self.fc(x.mean(dim=(2, 3)))


# torchvision vgg16 layer indices: convs at these features.<i> slots
_VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_VGG16_CHANS = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]


class _TorchVGG16(tnn.Module):
    """torchvision-vgg16-named twin (features.<i>/classifier.<i> keys)."""

    def __init__(self, num_classes=10):
        super().__init__()
        layers, cin = [], 3
        pool_after = {2, 4, 7, 10, 13}  # conv counts after which 'M' occurs
        n = 0
        for c in _VGG16_CHANS:
            layers += [tnn.Conv2d(cin, c, 3, padding=1), tnn.ReLU()]
            cin = c
            n += 1
            if n in pool_after:
                layers.append(tnn.MaxPool2d(2, 2))
        self.features = tnn.Sequential(*layers)
        self.avgpool = tnn.AdaptiveAvgPool2d((7, 7))
        self.classifier = tnn.Sequential(
            tnn.Linear(512 * 7 * 7, 4096), tnn.ReLU(), tnn.Dropout(),
            tnn.Linear(4096, 4096), tnn.ReLU(), tnn.Dropout(),
            tnn.Linear(4096, num_classes))

    def forward(self, x):
        x = self.avgpool(self.features(x))
        return self.classifier(torch.flatten(x, 1))


def _randomize_bn_stats(model, size):
    """A few training-mode passes so running_mean/var are non-trivial."""
    torch.manual_seed(0)
    model.train()
    with torch.no_grad():
        for _ in range(2):
            model(torch.randn(4, 3, size, size))
    model.eval()


def _forward_parity(torch_model, backbone_name, kind, size, tmp_path,
                    num_classes):
    torch.manual_seed(1)
    _randomize_bn_stats(torch_model, size)
    path = str(tmp_path / f"{backbone_name}.pth")
    torch.save(torch_model.state_dict(), path)  # REAL torch serialization

    model = BACKBONE.get(backbone_name)(num_classes=num_classes,
                                        dtype=jnp.float32)
    x_np = np.random.RandomState(2).randn(2, size, size, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np),
                           train=False)
    merged = load_pretrained_backbone(variables, path, kind, subpath=())
    assert merged is not variables

    with torch.no_grad():
        want = torch_model(torch.from_numpy(
            x_np.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply(merged, jnp.asarray(x_np),
                                 train=False)["logits"])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_resnet18_golden_forward_parity(tmp_path):
    _forward_parity(_TorchResNet18(10), "resnet18", "resnet", 64, tmp_path,
                    num_classes=10)


def test_vgg16_golden_forward_parity(tmp_path):
    # 224 input so the 7x7 head is exercised exactly as torchvision's
    _forward_parity(_TorchVGG16(10), "vgg16", "vgg", 224, tmp_path,
                    num_classes=10)
