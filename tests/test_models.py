"""Model zoo parity: flax layers/trunks vs torch references, import roundtrip."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from mdir_tpu.models import Model, initialize_model, torch_import  # noqa: E402
from mdir_tpu.models.retrievalnet import ImageRetrievalNet  # noqa: E402
from mdir_tpu.models.unet import OrigUNet, P2pUNet  # noqa: E402


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _nchw(a):
    return torch.tensor(np.transpose(a, (0, 3, 1, 2)))


def _state(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def test_alexnet_trunk_matches_torch(rng):
    """Our AlexNet trunk vs the torchvision features[:-1] stack in torch."""
    torch_feats = tnn.Sequential(
        tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, 1, 2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, 1, 1), tnn.ReLU(),
        tnn.Conv2d(384, 256, 3, 1, 1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, 1, 1), tnn.ReLU(),
    ).eval()

    x = rng.rand(1, 3, 79, 101).astype(np.float32)
    ref = _nhwc(torch_feats(torch.tensor(x)))

    net = ImageRetrievalNet(architecture="alexnet")
    from mdir_tpu.models.trunks import make_trunk
    trunk = make_trunk("alexnet")
    variables = trunk.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 79, 101, 3)))
    # torch Sequential indices 0,3,6,8,10 are the convs
    variables = torch_import.import_state_dict(variables, _state(torch_feats))
    ours, _ = trunk.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(ref, np.asarray(ours), rtol=1e-4, atol=1e-5)


def _torch_bottleneck_resnet():
    """Minimal 2-block bottleneck 'resnet' matching our layout (for parity)."""
    class Bottleneck(tnn.Module):
        def __init__(self, inp, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = tnn.Conv2d(inp, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.relu = tnn.ReLU()
            self.downsample = downsample

        def forward(self, x):
            idt = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                idt = self.downsample(x)
            return self.relu(out + idt)

    layer1 = tnn.Sequential(
        Bottleneck(64, 64, 1, tnn.Sequential(
            tnn.Conv2d(64, 256, 1, 1, bias=False), tnn.BatchNorm2d(256))),
        Bottleneck(256, 64),
    )
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 7, 2, 3, bias=False),
        tnn.BatchNorm2d(64),
        tnn.ReLU(),
        tnn.MaxPool2d(3, 2, 1),
        layer1,
    )


def test_resnet_block_matches_torch(rng):
    torch_net = _torch_bottleneck_resnet()
    # randomize BN running stats to catch stat import bugs
    for m in torch_net.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.data = torch.randn_like(m.running_mean) * 0.1
            m.running_var.data = torch.rand_like(m.running_var) + 0.5
    torch_net = torch_net.eval()

    from mdir_tpu.models.trunks import Bottleneck as FlaxBottleneck
    from mdir_tpu.models.trunks import ResNetFeatures

    flax_net = ResNetFeatures(FlaxBottleneck, (2,))
    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    variables = flax_net.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 96, 3)))
    variables = torch_import.import_state_dict(variables, _state(torch_net))
    with torch.no_grad():
        ref = _nhwc(torch_net(torch.tensor(x)))
    ours, _ = flax_net.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(ref, np.asarray(ours), rtol=1e-4, atol=1e-4)


def test_masked_trunk_equals_native_shape(rng):
    """The static-shape bucket strategy: padded batch + valid_hw == native."""
    from mdir_tpu.models.trunks import make_trunk

    trunk = make_trunk("alexnet")
    variables = trunk.init(jax.random.PRNGKey(5), jnp.zeros((1, 64, 64, 3)))

    img = rng.rand(1, 79, 101, 3).astype(np.float32)
    native, _ = trunk.apply(variables, jnp.asarray(img))

    padded = np.zeros((1, 128, 128, 3), np.float32)
    padded[:, :79, :101] = img
    feats, valid = trunk.apply(variables, jnp.asarray(padded),
                               jnp.asarray([[79, 101]]))
    fh, fw = native.shape[1], native.shape[2]
    assert int(valid[0, 0]) == fh and int(valid[0, 1]) == fw
    np.testing.assert_allclose(
        np.asarray(native), np.asarray(feats[:, :fh, :fw]), rtol=1e-4, atol=1e-5)
    # everything beyond the valid extent must be exactly zero
    assert np.abs(np.asarray(feats[:, fh:])).max() == 0
    assert np.abs(np.asarray(feats[:, :, fw:])).max() == 0


def test_retrievalnet_descriptor_masked_equals_native(rng):
    net = ImageRetrievalNet(architecture="alexnet", pooling="gem")
    variables = net.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))

    img = rng.rand(1, 79, 101, 3).astype(np.float32)
    native = net.apply(variables, jnp.asarray(img))

    padded = np.zeros((2, 128, 128, 3), np.float32)
    padded[0, :79, :101] = img[0]
    padded[1, :64, :64] = rng.rand(64, 64, 3)
    batched = net.apply(variables, jnp.asarray(padded),
                        valid_hw=jnp.asarray([[79, 101], [64, 64]]))
    np.testing.assert_allclose(
        np.asarray(native[0]), np.asarray(batched[0]), rtol=1e-4, atol=1e-6)
    assert np.abs(np.asarray(batched).sum()) > 0


def test_p2p_unet_matches_torch_geometry(rng):
    """P2pUNet: same parameter inventory as the reference torch module and a
    numerically identical forward after import."""
    class TorchSkip(tnn.Module):
        def __init__(self, nested, outer_ch, inter_ch, batchnorm=True, dropout=0.0):
            super().__init__()
            mods = [tnn.Conv2d(outer_ch, inter_ch, 4, 2, 1, bias=False)]
            if nested:
                if batchnorm:
                    mods += [tnn.BatchNorm2d(inter_ch)]
                mods += [tnn.LeakyReLU(0.2), nested]
            else:
                mods += [tnn.ReLU()]
            nested_ch = inter_ch * (2 if nested else 1)
            mods += [tnn.ConvTranspose2d(nested_ch, outer_ch, 4, 2, 1, bias=False)]
            if batchnorm:
                mods += [tnn.BatchNorm2d(outer_ch)]
            if dropout:
                mods += [tnn.Dropout(p=dropout)]
            mods += [tnn.ReLU()]
            self.nested = tnn.Sequential(*mods)

        def forward(self, x):
            return torch.cat([x, self.nested(x)], dim=1)

    nested_levels = 4
    blocks = [(64, 128), (128, 256), (256, 512), (512, 512)][:nested_levels]
    inner = None
    for cin, cout in reversed(blocks):
        inner = TorchSkip(inner, cin, cout)
    torch_net = tnn.Sequential(
        tnn.Conv2d(3, 64, 4, 2, 1, bias=False),
        tnn.LeakyReLU(0.2),
        inner,
        tnn.ConvTranspose2d(128, 3, 4, 2, 1, bias=True),
        tnn.Tanh(),
    ).eval()

    flax_net = P2pUNet(3, 3, nested_levels=nested_levels)
    variables = flax_net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    state = {"outerblock." + k: v for k, v in _state(torch_net).items()}
    variables = torch_import.import_state_dict(variables, state)

    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = _nhwc(torch_net(torch.tensor(x)))
    ours = flax_net.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(ref, np.asarray(ours), rtol=1e-4, atol=1e-5)


def test_model_registry():
    model = initialize_model({"architecture": "p2p_unet", "in_channels": 3,
                              "out_channels": 3, "nested_levels": 4})
    assert model.meta == {"in_channels": 3, "out_channels": 3}
    y = model.apply(jnp.zeros((1, 64, 64, 3)))
    assert y.shape == (1, 64, 64, 3)

    ident = initialize_model({"architecture": "identity"})
    x = jnp.ones((2, 4, 4, 3))
    np.testing.assert_array_equal(np.asarray(ident.apply(x)), np.asarray(x))


def test_orig_unet_shapes():
    model = initialize_model({"architecture": "orig_unet", "in_channels": 3,
                              "out_channels": 3, "nested_levels": 2,
                              "min_channels": 8})
    y = model.apply(jnp.zeros((1, 32, 32, 3)))
    assert y.shape == (1, 32, 32, 3)


def test_gem_p_parameter_path():
    net = ImageRetrievalNet(architecture="alexnet")
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    assert "p" in variables["params"]["pool"]
    assert float(variables["params"]["pool"]["p"][0]) == 3.0


def test_default_p2p_unet_initializes():
    """The default p2p_unet config (nested_levels=7, 8 stride-2 stages) must
    build through the factory: the init dummy is sized to survive the
    downsampling chain (a fixed 64px dummy used to zero out at depth 6)."""
    model = initialize_model({"architecture": "p2p_unet", "in_channels": 3,
                              "out_channels": 3})
    assert model.variables is not None
    leaves = jax.tree_util.tree_leaves(model.variables)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_model_registry_all_labels_initialize():
    """Every MODEL_LABELS entry must build with a minimal/default config.
    flax init traces the full forward, so this catches depth/shape crashes
    across the whole registry (the default-depth p2p family was broken by
    an undersized init dummy until round 3); cirnet_branched had no test
    coverage at all before this."""
    from mdir_tpu.models import MODEL_LABELS

    minimal = {
        "identity": {},
        # the reference's residual pixel mapper adds x[:, 0:2] (2-channel
        # chroma residual, autoencoder.py:65) — out_channels=2 is its contract
        "pixelconv_res": {"in_channels": 3, "out_channels": 2},
        "cirnet": {"cir_architecture": "alexnet", "local_whitening": False,
                   "pooling": "gem", "regional": False, "whitening": False,
                   "pretrained": False},
        "cirnet_branched": {
            "cir_architecture": "alexnet", "pooling": "gem",
            "whitening": False, "pretrained": False,
            "channels": {
                "merge": {"layer": 1, "aggregation": "sum"},
                "branches": {
                    "0_rgb": {"in": 3, "init": "clone", "weight": 1.0},
                    "1_aux": {"in": 1, "init": "sum", "weight": 0.5},
                },
            },
        },
    }
    for label in sorted(MODEL_LABELS):
        params = dict(minimal.get(label, {"in_channels": 3,
                                          "out_channels": 3}))
        params["architecture"] = label
        model = initialize_model(params)
        assert model.variables is not None or label == "identity", label


def test_outconv_dynint_odd_size_forward():
    """The resize-convolution variant interpolates each skip back to its
    exact input size, so non-power-of-two inputs flow through (DynSkipBlock;
    reference unet.py dynamic-interpolate variant)."""
    model = initialize_model({"architecture": "outconv_dynint_unet",
                              "in_channels": 3, "out_channels": 3,
                              "nested_levels": 3})
    x = jnp.zeros((1, 100, 108, 3), jnp.float32)
    y = model.apply(x)
    assert y.shape == (1, 100, 108, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_branched_input_merge():
    """cirnet_branched with merge.layer == 0: one trunk whose first conv is
    widened to the concatenated branch channels (reference cirnet.py
    input-merge mode)."""
    model = initialize_model({
        "architecture": "cirnet_branched", "cir_architecture": "alexnet",
        "pooling": "gem", "whitening": False, "pretrained": False,
        "channels": {
            "merge": {"layer": 0, "aggregation": "concat"},
            "branches": {"0_rgb": {"in": 3, "init": "clone", "weight": 1.0},
                          "1_aux": {"in": 2, "init": "sum", "weight": 0.5}}}})
    assert model.meta["in_channels"] == 5
    y = model.apply(jnp.zeros((1, 64, 64, 5), jnp.float32))
    assert np.isfinite(np.asarray(y)).all()


def test_weight_init_normal():
    """'normal' init: N(0,1) on conv kernels AND biases (reference
    init_weights_normal)."""
    from mdir_tpu.models.weight_init import WEIGHT_INITIALIZATIONS

    model = initialize_model({"architecture": "pixelconv_regr",
                              "in_channels": 3, "out_channels": 3,
                              "hidden": [64]})
    fresh = WEIGHT_INITIALIZATIONS["normal"](jax.random.PRNGKey(0),
                                             model.params)
    flat = np.concatenate([np.asarray(l).ravel()
                           for l in jax.tree_util.tree_leaves(fresh)])
    assert abs(flat.std() - 1.0) < 0.1 and abs(flat.mean()) < 0.1


def test_regional_pool_norms_aggregate_like_reference():
    """The regional (Rpool) descriptor is l2n(l2n(sum(region_vecs))) — the
    reference norms the aggregate inside Rpool (cirtorch pooling.py:95)
    and the network-level L2N norms it AGAIN. Pinned by recomposing the
    torch-pinned ops in the reference order over the same trunk features
    and requiring near-exact equality with the module output."""
    import jax.numpy as jnp

    from mdir_tpu.models import initialize_model
    from mdir_tpu.models.trunks import make_trunk
    from mdir_tpu.ops import pooling as pool_ops

    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": "alexnet",
        "local_whitening": False, "pooling": "gem", "regional": True,
        "whitening": False, "pretrained": False})
    variables = model.variables

    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(1, 70, 70, 3).astype(np.float32))
    got = np.asarray(model.apply(img))  # (1, D)

    trunk = make_trunk("alexnet", name="features")
    feats, _ = trunk.apply(
        {"params": variables["params"]["features"]}, img)

    params = variables["params"]
    p = float(np.asarray(params["pool"]["p"]).reshape(()))
    kernel = jnp.asarray(params["pool_whiten"]["dense"]["kernel"])
    bias = jnp.asarray(params["pool_whiten"]["dense"]["bias"])
    vecs = pool_ops.roipool(feats, lambda r: pool_ops.gem(r, p=p))
    vecs = pool_ops.l2n(vecs)
    vecs = pool_ops.l2n(vecs @ kernel + bias)
    aggregate = pool_ops.l2n(vecs.sum(axis=-2))  # Rpool's own norm
    expected = pool_ops.l2n(aggregate)           # the network-level norm
    np.testing.assert_allclose(got, np.asarray(expected), rtol=1e-5,
                               atol=1e-6)


def test_outconv_dynint_unet_matches_torch_geometry(rng):
    """OutconvP2pUNetDynamicInterpolate: torch state_dict keys (down.0,
    down.2.down.*, down.2.up.*, up.0/2 — reference unet.py:208-280) import
    by direct name mapping and the forward matches numerically.

    Regression: the flax variant used flat 'down_0'/'blk_d0' names, so
    reference-trained dynint checkpoints could not import at all."""
    class TorchSkipConn(tnn.Module):
        def __init__(self, nested, outer_ch, inter_ch):
            super().__init__()
            mods = [tnn.Conv2d(outer_ch, inter_ch, 4, 2, 1),
                    tnn.LeakyReLU(0.2)]
            if nested is not None:
                mods.append(nested)
            nested_ch = inter_ch * (2 if nested is not None else 1)
            self.down = tnn.Sequential(*mods)
            self.up = tnn.Sequential(
                tnn.Conv2d(nested_ch, outer_ch, 3, 1, 1), tnn.ReLU())

        def forward(self, x):
            import torch.nn.functional as F

            y = self.down(x)
            y = F.interpolate(y, size=x.shape[-2:], mode="bilinear")
            return torch.cat([x, self.up(y)], dim=1)

    class TorchDynInt(tnn.Module):
        def __init__(self, nested_levels=2, outconv_channels=32):
            super().__init__()
            blocks = [(64, 128), (128, 256), (256, 512)][:nested_levels]
            blocks += [(512, 512)] * (nested_levels - len(blocks))
            inner = None
            for cin, cout in reversed(blocks):
                inner = TorchSkipConn(inner, cin, cout)
            self.down = tnn.Sequential(
                tnn.Conv2d(3, 64, 4, 2, 1), tnn.LeakyReLU(0.2), inner)
            self.up = tnn.Sequential(
                tnn.Conv2d(128, outconv_channels, 3, 1, 1), tnn.ReLU(),
                tnn.Conv2d(outconv_channels, 3, 3, padding=1))

        def forward(self, x):
            import torch.nn.functional as F

            y = self.down(x)
            y = F.interpolate(y, size=x.shape[-2:], mode="bilinear")
            return self.up(y)

    from mdir_tpu.models.unet import OutconvP2pUNetDynamicInterpolate

    torch_net = TorchDynInt(nested_levels=2).eval()
    flax_net = OutconvP2pUNetDynamicInterpolate(3, 3, nested_levels=2)
    variables = flax_net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    variables = torch_import.import_state_dict(variables, _state(torch_net))

    x = rng.rand(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = _nhwc(torch_net(torch.tensor(x)))
    ours = flax_net.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    # jax bilinear resize vs torch F.interpolate(align_corners=False) agree
    # at these integral up/down factors
    np.testing.assert_allclose(ref, np.asarray(ours), rtol=1e-3, atol=1e-4)


def test_convt_phase_decomposition_matches_lax(rng, monkeypatch):
    """The sub-pixel phase path (MDIR_TPU_CONVT_PHASE=1, opt-in) equals
    lax.conv_transpose for both zoo geometries — forward and gradients."""
    from mdir_tpu.models.layers import ConvTranspose

    for k, p, cin, cout in [(4, 1, 5, 7), (2, 0, 6, 3)]:
        mod = ConvTranspose(cout, k, 2, p, use_bias=True)
        x = jnp.asarray(rng.rand(2, 6, 8, cin).astype(np.float32))
        monkeypatch.setenv("MDIR_TPU_CONVT_PHASE", "0")
        variables = mod.init(jax.random.PRNGKey(1), x)

        def loss(v, x, mod=mod):
            return jnp.sum(jnp.sin(mod.apply(v, x)))

        ref_y = mod.apply(variables, x)
        ref_g = jax.grad(loss)(variables, x)
        monkeypatch.setenv("MDIR_TPU_CONVT_PHASE", "1")
        fast_y = mod.apply(variables, x)
        fast_g = jax.grad(loss)(variables, x)
        assert ref_y.shape == (2, 12, 16, cout)
        np.testing.assert_allclose(np.asarray(ref_y), np.asarray(fast_y),
                                   rtol=1e-5, atol=1e-5)
        for key in ("kernel", "bias"):
            np.testing.assert_allclose(
                np.asarray(ref_g["params"][key]),
                np.asarray(fast_g["params"][key]), rtol=1e-4, atol=1e-4)
