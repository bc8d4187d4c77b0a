"""Full-trunk golden parity for resnet18 (BasicBlock assembly) and vgg16."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from mdir_tpu.models import torch_import  # noqa: E402
from mdir_tpu.models.trunks import make_trunk  # noqa: E402


def _torch_basicblock_resnet18():
    class BasicBlock(tnn.Module):
        def __init__(self, inp, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = tnn.Conv2d(inp, planes, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.relu = tnn.ReLU()
            self.downsample = downsample

        def forward(self, x):
            idt = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                idt = self.downsample(x)
            return self.relu(out + idt)

    def make_layer(inp, planes, blocks, stride):
        downsample = None
        if stride != 1 or inp != planes:
            downsample = tnn.Sequential(
                tnn.Conv2d(inp, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes))
        layers = [BasicBlock(inp, planes, stride, downsample)]
        for _ in range(1, blocks):
            layers.append(BasicBlock(planes, planes))
        return tnn.Sequential(*layers)

    return tnn.Sequential(
        tnn.Conv2d(3, 64, 7, 2, 3, bias=False),
        tnn.BatchNorm2d(64),
        tnn.ReLU(),
        tnn.MaxPool2d(3, 2, 1),
        make_layer(64, 64, 2, 1),
        make_layer(64, 128, 2, 2),
        make_layer(128, 256, 2, 2),
        make_layer(256, 512, 2, 2),
    )


def _torch_vgg16_features():
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]  # final M dropped ([:-1])
    layers = []
    inp = 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(inp, v, 3, 1, 1), tnn.ReLU()]
            inp = v
    return tnn.Sequential(*layers)


def _randomize_bn(net, rng):
    for m in net.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.data = torch.tensor(
                rng.randn(m.num_features).astype(np.float32)) * 0.1
            m.running_var.data = torch.tensor(
                rng.rand(m.num_features).astype(np.float32)) + 0.5


def test_resnet18_trunk_parity(rng):
    torch_net = _torch_basicblock_resnet18()
    _randomize_bn(torch_net, rng)
    torch_net = torch_net.eval()

    trunk = make_trunk("resnet18")
    variables = trunk.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    state = {k: v.detach().numpy() for k, v in torch_net.state_dict().items()}
    variables = torch_import.import_state_dict(variables, state)

    x = rng.rand(1, 3, 96, 128).astype(np.float32)
    with torch.no_grad():
        ref = torch_net(torch.tensor(x)).numpy().transpose(0, 2, 3, 1)
    ours, _ = trunk.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(ref, np.asarray(ours), rtol=1e-4, atol=1e-4)


def test_vgg16_trunk_parity(rng):
    torch_net = _torch_vgg16_features().eval()
    trunk = make_trunk("vgg16")
    variables = trunk.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    state = {k: v.detach().numpy() for k, v in torch_net.state_dict().items()}
    variables = torch_import.import_state_dict(variables, state)

    x = rng.rand(1, 3, 96, 112).astype(np.float32)
    with torch.no_grad():
        ref = torch_net(torch.tensor(x)).numpy().transpose(0, 2, 3, 1)
    ours, _ = trunk.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(ref, np.asarray(ours), rtol=1e-4, atol=1e-4)

    # masked-bucket equivalence for the vgg trunk too
    padded = np.zeros((1, 128, 128, 3), np.float32)
    padded[:, :96, :112] = x.transpose(0, 2, 3, 1)
    feats, valid = trunk.apply(variables, jnp.asarray(padded),
                               jnp.asarray([[96, 112]]))
    fh, fw = ref.shape[1], ref.shape[2]
    assert (int(valid[0, 0]), int(valid[0, 1])) == (fh, fw)
    np.testing.assert_allclose(ref, np.asarray(feats[:, :fh, :fw]),
                               rtol=1e-4, atol=1e-4)
