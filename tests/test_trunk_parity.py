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


def _torch_densenet121_features():
    """torchvision densenet121 ``features`` re-wrapped the cirtorch way:
    list(children()) into a Sequential (indices 0..11) + appended ReLU
    (imageretrievalnet.py:175-177)."""

    class DenseLayer(tnn.Module):
        def __init__(self, inp, growth):
            super().__init__()
            self.norm1 = tnn.BatchNorm2d(inp)
            self.conv1 = tnn.Conv2d(inp, 4 * growth, 1, bias=False)
            self.norm2 = tnn.BatchNorm2d(4 * growth)
            self.conv2 = tnn.Conv2d(4 * growth, growth, 3, padding=1,
                                    bias=False)

        def forward(self, x):
            y = self.conv1(torch.relu(self.norm1(x)))
            y = self.conv2(torch.relu(self.norm2(y)))
            return torch.cat([x, y], 1)

    class DenseBlock(tnn.Module):
        def __init__(self, inp, growth, n):
            super().__init__()
            for i in range(n):
                self.add_module("denselayer%d" % (i + 1),
                                DenseLayer(inp + i * growth, growth))

        def forward(self, x):
            for m in self.children():
                x = m(x)
            return x

    class Transition(tnn.Module):
        def __init__(self, inp, out):
            super().__init__()
            self.norm = tnn.BatchNorm2d(inp)
            self.conv = tnn.Conv2d(inp, out, 1, bias=False)

        def forward(self, x):
            return tnn.functional.avg_pool2d(
                self.conv(torch.relu(self.norm(x))), 2, 2)

    init, growth, blocks = 64, 32, (6, 12, 24, 16)
    mods = [tnn.Conv2d(3, init, 7, 2, 3, bias=False), tnn.BatchNorm2d(init),
            tnn.ReLU(), tnn.MaxPool2d(3, 2, 1)]
    ch = init
    for bi, n in enumerate(blocks):
        mods.append(DenseBlock(ch, growth, n))
        ch += n * growth
        if bi < len(blocks) - 1:
            mods.append(Transition(ch, ch // 2))
            ch //= 2
    mods += [tnn.BatchNorm2d(ch), tnn.ReLU()]
    return tnn.Sequential(*mods)


def _torch_squeezenet_features(version):
    class Fire(tnn.Module):
        def __init__(self, inp, sq, e1, e3):
            super().__init__()
            self.squeeze = tnn.Conv2d(inp, sq, 1)
            self.expand1x1 = tnn.Conv2d(sq, e1, 1)
            self.expand3x3 = tnn.Conv2d(sq, e3, 3, padding=1)

        def forward(self, x):
            s = torch.relu(self.squeeze(x))
            return torch.cat([torch.relu(self.expand1x1(s)),
                              torch.relu(self.expand3x3(s))], 1)

    mp = lambda: tnn.MaxPool2d(3, 2, ceil_mode=True)
    if version == "squeezenet1_0":
        return tnn.Sequential(
            tnn.Conv2d(3, 96, 7, 2), tnn.ReLU(), mp(),
            Fire(96, 16, 64, 64), Fire(128, 16, 64, 64),
            Fire(128, 32, 128, 128), mp(),
            Fire(256, 32, 128, 128), Fire(256, 48, 192, 192),
            Fire(384, 48, 192, 192), Fire(384, 64, 256, 256), mp(),
            Fire(512, 64, 256, 256))
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 3, 2), tnn.ReLU(), mp(),
        Fire(64, 16, 64, 64), Fire(128, 16, 64, 64), mp(),
        Fire(128, 32, 128, 128), Fire(256, 32, 128, 128), mp(),
        Fire(256, 48, 192, 192), Fire(384, 48, 192, 192),
        Fire(384, 64, 256, 256), Fire(512, 64, 256, 256))


def _golden_and_masked_bucket(torch_net, arch, x, bucket_hw, atol=1e-4):
    """Import the torch weights, pin native-shape parity AND padded-bucket
    (valid-extent-masked) equality against the torch forward."""
    from mdir_tpu.models.trunks import trunk_valid_extent

    trunk = make_trunk(arch)
    variables = trunk.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    state = {k: v.detach().numpy() for k, v in torch_net.state_dict().items()}
    variables = torch_import.import_state_dict(variables, state)

    with torch.no_grad():
        ref = torch_net(torch.tensor(x)).numpy().transpose(0, 2, 3, 1)
    nhwc = x.transpose(0, 2, 3, 1)
    ours, _ = trunk.apply(variables, jnp.asarray(nhwc))
    np.testing.assert_allclose(ref, np.asarray(ours), rtol=1e-4, atol=atol)

    padded = np.zeros((1,) + bucket_hw + (3,), np.float32)
    padded[:, :nhwc.shape[1], :nhwc.shape[2]] = nhwc
    feats, valid = trunk.apply(variables, jnp.asarray(padded),
                               jnp.asarray([nhwc.shape[1:3]], np.int32))
    fh, fw = ref.shape[1], ref.shape[2]
    assert (int(valid[0, 0]), int(valid[0, 1])) == (fh, fw)
    assert trunk_valid_extent(arch, nhwc.shape[1:3]) == (fh, fw)
    np.testing.assert_allclose(ref, np.asarray(feats[:, :fh, :fw]),
                               rtol=1e-4, atol=atol)


def test_densenet121_trunk_parity(rng):
    net = _torch_densenet121_features()
    _randomize_bn(net, rng)
    net = net.eval()
    x = rng.rand(1, 3, 69, 96).astype(np.float32)
    _golden_and_masked_bucket(net, "densenet121", x, (128, 128), atol=3e-4)


@pytest.mark.parametrize("arch", ["squeezenet1_0", "squeezenet1_1"])
def test_squeezenet_trunk_parity(arch, rng):
    net = _torch_squeezenet_features(arch).eval()
    x = rng.rand(1, 3, 75, 96).astype(np.float32)
    _golden_and_masked_bucket(net, arch, x, (128, 128))


def test_remaining_densenets_initialize_and_mask(rng):
    """densenet161/169/201: init, masked-bucket == native-shape, and the
    OUTPUT_DIM table (the parity-critical densenet121 has the torch golden)."""
    from mdir_tpu.models.trunks import OUTPUT_DIM, trunk_valid_extent

    for arch in ("densenet161", "densenet169", "densenet201"):
        trunk = make_trunk(arch)
        x = rng.rand(1, 69, 96, 3).astype(np.float32)
        variables = trunk.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        native, _ = trunk.apply(variables, jnp.asarray(x))
        assert native.shape[-1] == OUTPUT_DIM[arch]
        padded = np.zeros((1, 128, 128, 3), np.float32)
        padded[:, :69, :96] = x
        feats, valid = trunk.apply(variables, jnp.asarray(padded),
                                   jnp.asarray([[69, 96]], np.int32))
        fh, fw = native.shape[1], native.shape[2]
        assert (int(valid[0, 0]), int(valid[0, 1])) == (fh, fw)
        assert trunk_valid_extent(arch, (69, 96)) == (fh, fw)
        np.testing.assert_allclose(np.asarray(native),
                                   np.asarray(feats[:, :fh, :fw]),
                                   rtol=1e-4, atol=1e-4)
