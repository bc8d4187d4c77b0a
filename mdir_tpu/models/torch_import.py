"""Import reference torch checkpoints (.pth pickles) into flax variable trees.

torch is an *offline conversion* dependency only — never on the TPU compute
path. The flax model zoo names submodules after the torch state_dict keys, so
conversion is a mechanical walk:

* conv weight (O,I,kH,kW)        -> <name>/conv/kernel  (kH,kW,I,O)
* conv-transpose weight (I,O,k,k) -> <name>/kernel      (k,k,I,O)
* linear weight (O,I)            -> <name>/dense/kernel (I,O)
* batchnorm weight/bias          -> <name>/bn/{scale,bias}
* running_mean/var               -> batch_stats/.../bn/{mean,var}
* ``pool.p``                     -> pool/p

Handles: whole ImageRetrievalNet states (mdir CirNetwork ``model_state`` and
official cirtorch ``state_dict``), bare ``features`` state dicts (the
caffe-converted FEATURES artifacts), U-Net / autoencoder states, and
whitening pkls ({'P','m'} -> whiten Linear, imageretrievalnet.py:229-233).
"""

import numpy as np

from ..tools.utils import get_data_root, load_path, load_url

# Caffe-pretrained trunk features (imageretrievalnet.py:17-22).
FEATURES_URLS = {
    "vgg16": "http://cmp.felk.cvut.cz/cnnimageretrieval/data/networks/imagenet/imagenet-caffe-vgg16-features-d369c8e.pth",
    "resnet50": "http://cmp.felk.cvut.cz/cnnimageretrieval/data/networks/imagenet/imagenet-caffe-resnet50-features-ac468af.pth",
    "resnet101": "http://cmp.felk.cvut.cz/cnnimageretrieval/data/networks/imagenet/imagenet-caffe-resnet101-features-10a101d.pth",
    "resnet152": "http://cmp.felk.cvut.cz/cnnimageretrieval/data/networks/imagenet/imagenet-caffe-resnet152-features-1011020.pth",
}

# Precomputed whitening artifacts (imageretrievalnet.py:26-59).
L_WHITENING_URLS = {
    "resnet101": "http://cmp.felk.cvut.cz/cnnimageretrieval/data/whiten/retrieval-SfM-120k/retrieval-SfM-120k-resnet101-lwhiten-9f830ef.pth",
}
R_WHITENING_URLS = {
    "alexnet-gem-r": "http://cmp.felk.cvut.cz/cnnimageretrieval/data/whiten/retrieval-SfM-120k/retrieval-SfM-120k-alexnet-gem-r-rwhiten-c8cf7e2.pth",
    "vgg16-gem-r": "http://cmp.felk.cvut.cz/cnnimageretrieval/data/whiten/retrieval-SfM-120k/retrieval-SfM-120k-vgg16-gem-r-rwhiten-19b204e.pth",
    "resnet101-mac-r": "http://cmp.felk.cvut.cz/cnnimageretrieval/data/whiten/retrieval-SfM-120k/retrieval-SfM-120k-resnet101-mac-r-rwhiten-7f1ed8c.pth",
    "resnet101-gem-r": "http://cmp.felk.cvut.cz/cnnimageretrieval/data/whiten/retrieval-SfM-120k/retrieval-SfM-120k-resnet101-gem-r-rwhiten-adace84.pth",
}
WHITENING_URLS = {
    "alexnet-gem": "http://cmp.felk.cvut.cz/cnnimageretrieval/data/whiten/retrieval-SfM-120k/retrieval-SfM-120k-alexnet-gem-whiten-454ad53.pth",
    "alexnet-gem-r": "http://cmp.felk.cvut.cz/cnnimageretrieval/data/whiten/retrieval-SfM-120k/retrieval-SfM-120k-alexnet-gem-r-whiten-4c9126b.pth",
    "vgg16-gem": "http://cmp.felk.cvut.cz/cnnimageretrieval/data/whiten/retrieval-SfM-120k/retrieval-SfM-120k-vgg16-gem-whiten-eaa6695.pth",
    "vgg16-gem-r": "http://cmp.felk.cvut.cz/cnnimageretrieval/data/whiten/retrieval-SfM-120k/retrieval-SfM-120k-vgg16-gem-r-whiten-83582df.pth",
    "resnet50-gem": "http://cmp.felk.cvut.cz/cnnimageretrieval/data/whiten/retrieval-SfM-120k/retrieval-SfM-120k-resnet50-gem-whiten-f15da7b.pth",
    "resnet101-mac-r": "http://cmp.felk.cvut.cz/cnnimageretrieval/data/whiten/retrieval-SfM-120k/retrieval-SfM-120k-resnet101-mac-r-whiten-9df41d3.pth",
    "resnet101-gem": "http://cmp.felk.cvut.cz/cnnimageretrieval/data/whiten/retrieval-SfM-120k/retrieval-SfM-120k-resnet101-gem-whiten-22ab0c1.pth",
    "resnet101-gem-r": "http://cmp.felk.cvut.cz/cnnimageretrieval/data/whiten/retrieval-SfM-120k/retrieval-SfM-120k-resnet101-gem-r-whiten-b379c0a.pth",
}


def load_torch_pickle(path_or_file):
    """torch.load on CPU, tensors converted to numpy."""
    import torch

    obj = torch.load(path_or_file, map_location="cpu", weights_only=False)

    def to_numpy(x):
        if isinstance(x, torch.Tensor):
            return x.detach().numpy()
        if isinstance(x, dict):
            return {k: to_numpy(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return type(x)(to_numpy(v) for v in x)
        return x

    return to_numpy(obj)


def fetch_artifact(url_or_path):
    """URL -> cached local path (hash-checked); local path passes through."""
    if str(url_or_path).startswith(("http://", "https://")):
        cache = get_data_root() + "/networks"
        return load_url(url_or_path, cache_dir=cache)
    return url_or_path


# ---------------------------------------------------------------------------
# Generic key mapping
# ---------------------------------------------------------------------------

def _resnet_seq_remap(key):
    """cirtorch wraps resnet children in nn.Sequential: 0=conv1, 1=bn1,
    4..7=layer1..4. Remap 'N.B.rest' -> our flax names."""
    parts = key.split(".")
    idx = int(parts[0])
    if idx == 0:
        return ["conv1"] + parts[1:]
    if idx == 1:
        return ["bn1"] + parts[1:]
    if idx in (4, 5, 6, 7):
        block = parts[1]
        rest = parts[2:]
        if rest[:1] == ["downsample"]:
            rest = ["downsample_%s" % rest[1]] + rest[2:]
        return ["layer%d_%s" % (idx - 3, block)] + rest
    raise KeyError(key)


def _is_resnet_features(keys):
    """Resnet Sequential keys look like '4.0.conv1.weight' — the block
    index must be numeric (densenet's '4.denselayer1.conv1.weight' is not)."""
    for key in keys:
        parts = key.split(".")
        if parts[0] in ("4", "5", "6", "7") and len(parts) > 2 \
                and parts[1].isdigit() and "conv1" in key:
            return True
    return False


def _set_path(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _get_node(tree, path):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def assign_torch_entry(params, batch_stats, flax_prefix, leaf_name, value):
    """Assign one torch tensor into the flax trees, inferring the layer type
    from the existing (initialized) tree structure."""
    node = _get_node(params, flax_prefix)
    if node is None:
        raise KeyError("No flax node for torch path %s" % ".".join(flax_prefix))

    if leaf_name == "num_batches_tracked":
        return
    if leaf_name in ("running_mean", "running_var"):
        stat = "mean" if leaf_name == "running_mean" else "var"
        _set_path(batch_stats, list(flax_prefix) + ["bn", stat], value)
        return

    if "conv" in node:  # our Conv wrapper
        if leaf_name == "weight":
            _set_path(params, list(flax_prefix) + ["conv", "kernel"],
                      np.transpose(value, (2, 3, 1, 0)))
        else:
            _set_path(params, list(flax_prefix) + ["conv", "bias"], value)
    elif "dense" in node:  # our Dense wrapper
        if leaf_name == "weight":
            _set_path(params, list(flax_prefix) + ["dense", "kernel"], value.T)
        else:
            _set_path(params, list(flax_prefix) + ["dense", "bias"], value)
    elif "bn" in node:  # our BatchNorm wrapper
        target = "scale" if leaf_name == "weight" else "bias"
        _set_path(params, list(flax_prefix) + ["bn", target], value)
    elif "kernel" in node and node["kernel"].ndim == 4:  # ConvTranspose
        if leaf_name == "weight":
            _set_path(params, list(flax_prefix) + ["kernel"],
                      np.transpose(value, (2, 3, 0, 1)))
        else:
            _set_path(params, list(flax_prefix) + ["bias"], value)
    elif leaf_name == "p" or (len(flax_prefix) and flax_prefix[-1] == "pool"):
        _set_path(params, list(flax_prefix) + ["p"], value.reshape(-1))
    else:
        raise KeyError("Cannot infer layer type at %s (%s)"
                       % (".".join(flax_prefix), leaf_name))


def import_state_dict(variables, state_dict, key_map=None):
    """Import a torch state_dict into a flax variables tree (returns new tree).

    ``key_map`` optionally rewrites a torch key into flax path components;
    default: dots split, with resnet Sequential remapping when detected.
    """
    import copy

    params = copy.deepcopy(dict(variables.get("params", {})))
    batch_stats = copy.deepcopy(dict(variables.get("batch_stats", {})))

    keys = list(state_dict.keys())
    resnet_root = None
    if key_map is None:
        # detect resnet-features sequential keys either at root or under
        # a 'features.' prefix
        if _is_resnet_features([k for k in keys]):
            resnet_root = ""
        elif _is_resnet_features(
                [k[len("features."):] for k in keys if k.startswith("features.")]):
            resnet_root = "features."

    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        if key_map is not None:
            path = key_map(key)
            if path is None:
                continue
        else:
            parts = key.split(".")
            if resnet_root == "" and parts[0].isdigit():
                parts = _resnet_seq_remap(key)
            elif resnet_root == "features." and key.startswith("features.") \
                    and parts[1].isdigit():
                parts = ["features"] + _resnet_seq_remap(key[len("features."):])
            # cirtorch Rpool naming: pool.rpool.p -> pool/p; pool.whiten -> pool_whiten
            if parts[:2] == ["pool", "rpool"]:
                parts = ["pool"] + parts[2:]
            elif parts[:2] == ["pool", "whiten"]:
                parts = ["pool_whiten"] + parts[2:]
            path = parts
        flax_prefix, leaf = path[:-1], path[-1]
        if leaf == "p" and flax_prefix and flax_prefix[-1] == "pool":
            _set_path(params, list(flax_prefix) + ["p"], value.reshape(-1))
            continue
        assign_torch_entry(params, batch_stats, flax_prefix, leaf, value)

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


# ---------------------------------------------------------------------------
# High-level loaders
# ---------------------------------------------------------------------------

def load_pretrained_features(model, architecture):
    """Fill model.variables['params']['features'] from the caffe FEATURES
    artifact (or torchvision-pretrained weights are unavailable offline)."""
    if architecture not in FEATURES_URLS:
        return model  # reference falls back to torchvision weights; offline no-op
    path = fetch_artifact(FEATURES_URLS[architecture])
    state = load_torch_pickle(path)
    scoped = {"features." + k: v for k, v in state.items()}
    model.variables = import_state_dict(model.variables, scoped)
    return model


def load_whitening_pkl(model, whitening_path):
    """Whitening pkl {'P','m'} -> whiten Linear (weight=P, bias=-P@m)."""
    whit = load_path(whitening_path)
    P = np.asarray(whit["P"], np.float32)
    m = np.asarray(whit["m"], np.float32).reshape(-1, 1)
    params = model.variables["params"]
    params["whiten"]["dense"]["kernel"] = P.T
    params["whiten"]["dense"]["bias"] = (-P @ m).reshape(-1)
    return model


def import_model_state(model, torch_state):
    """Import a full torch model state dict (retrievalnet / unet / ae)."""
    model.variables = import_state_dict(model.variables, torch_state)
    return model
