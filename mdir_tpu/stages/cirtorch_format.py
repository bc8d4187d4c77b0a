"""Official-cirtorch-checkpoint interop stages.

Parity with ``mdir/stages/cirtorch_format/test.py``: ``embed`` with an
official checkpoint (extract_vectors semantics through our batched path),
``learn_whitening`` / ``load_whitening`` (Lw from the whiten db or embedded in
the checkpoint meta), and ``convert_contained_net`` — official ``.pth`` ->
our CirNetwork checkpoint format.
"""
import math
import os
import pickle
import time

import numpy as np

from ..data.datasets import cid2filename
from ..data.transforms import initialize_transforms
from ..learning.checkpoints import load_checkpoint_any, save_state
from ..learning.network import CirNetwork
from ..models import initialize_model, torch_import
from ..ops.whitening import whitenapply, whitenlearn
from ..parallel.extract import extract_vectors_batched, _load_images
from ..tools.utils import get_data_root, path_join


def _load_official(net_path):
    """Official cirtorch checkpoint -> (Model, meta, full state)."""
    assert os.path.exists(net_path), net_path
    print(">> Loading network:\n>>>> '{}'".format(net_path))
    state = load_checkpoint_any(net_path)
    meta = state["meta"]
    model = initialize_model({
        "architecture": "cirnet",
        "cir_architecture": meta["architecture"],
        "local_whitening": meta.get("local_whitening", False),
        "pooling": meta["pooling"],
        "regional": meta.get("regional", False),
        "whitening": meta["whitening"],
        "pretrained": False,
    })
    torch_import.import_model_state(model, state["state_dict"])
    return model, meta, state


def _multiscale(multiscale):
    if not isinstance(multiscale, bool):
        return multiscale
    return [1, 1.0 / math.sqrt(2), 1.0 / 2] if multiscale else [1]


def _extract(model, meta, impaths, image_size, ms, bbxs=None):
    transform = initialize_transforms("pil2np | totensor | normalize",
                                      [meta["mean"], meta["std"]])
    msp = 1.0
    if meta["pooling"] == "gem" and not meta["whitening"]:
        msp = float(model.pool_p)
    arrays = _load_images(impaths, image_size, transform, bbxs)
    return extract_vectors_batched(model, arrays, scales=ms, msp=msp)


def embed(params, data):
    net = params.pop("net")
    imgdir = params.pop("imgdir")
    whitening = params.pop("whitening", None)
    whitening_dir = params.pop("whitening_dir", None)
    image_size = params.pop("image_size", 1024)
    multiscale = params.pop("multiscale", True)
    assert not params, params.keys()
    input_images, bbxs = (data[0], None) if len(data) == 1 else data
    impaths = [path_join(imgdir, x) for x in input_images]
    if not data[0]:
        return (({"status": "skipped"}, [], [])
                + (([],) if whitening_dir else tuple()))

    model, meta, _state = _load_official(net)
    ms = _multiscale(multiscale)

    lw = None
    if whitening_dir:
        lw_path = os.path.join(whitening_dir, "%s_%s_%s_%s.lw.pkl"
                               % (whitening, None, image_size, multiscale))
        print(">> {}: Loading whitening...".format(whitening))
        with open(lw_path, "rb") as handle:
            lw = pickle.load(handle)

    print(">> Images descriptors...")
    vecs = _extract(model, meta, impaths, image_size, ms, bbxs)

    if lw is not None:
        vecs_lw = np.asarray(whitenapply(vecs, lw["m"], lw["P"]))
        return {}, input_images, vecs.T, vecs_lw.T
    return {}, input_images, vecs.T


def learn_whitening(params, data):
    net = params.pop("net")
    whitening = params.pop("whitening")
    whitening_dir = params.pop("whitening_dir", None)
    image_size = params.pop("image_size", 1024)
    multiscale = params.pop("multiscale", True)
    params.pop("imgdir", None)
    assert not params
    assert not data

    whitening = {"sfm30k": "retrieval-SfM-30k",
                 "sfm120k": "retrieval-SfM-120k"}.get(whitening, whitening)

    model, meta, _state = _load_official(net)
    ms = _multiscale(multiscale)

    lw, elapsed = _compute_whitening(whitening, model, meta, image_size, ms)

    if whitening_dir:
        os.makedirs(whitening_dir, exist_ok=True)
        lw_path = os.path.join(whitening_dir, "%s_%s_%s_%s.lw.pkl"
                               % (whitening, None, image_size, multiscale))
        with open(lw_path, "wb") as handle:
            pickle.dump(lw, handle)
        return ({"whitening_learn": int(elapsed)},)
    return {"whitening_learn": int(elapsed)}, lw


def load_whitening(params, data):
    net = params.pop("net")
    whitening = params.pop("whitening")
    whitening_dir = params.pop("whitening_dir", None)
    image_size = params.pop("image_size", 1024)
    multiscale = params.pop("multiscale", True)
    params.pop("imgdir", None)
    assert not params
    assert not data
    assert os.path.exists(net), net

    whitening = {"sfm30k": "retrieval-SfM-30k",
                 "sfm120k": "retrieval-SfM-120k"}.get(whitening, whitening)

    print(">> Loading network:\n>>>> '{}'".format(net))
    state = load_checkpoint_any(net)
    assert isinstance(multiscale, bool)
    lw = state["meta"]["Lw"][whitening]["ms" if multiscale else "ss"]

    if whitening_dir:
        os.makedirs(whitening_dir, exist_ok=True)
        lw_path = os.path.join(whitening_dir, "%s_%s_%s_%s.lw.pkl"
                               % (whitening, None, image_size, multiscale))
        with open(lw_path, "wb") as handle:
            pickle.dump(lw, handle)
        return ({},)
    return {}, lw


def convert_contained_net(params, data):
    """Official cirtorch .pth -> our CirNetwork checkpoint."""
    source = params.pop("source")
    net = params.pop("net")
    assert not params
    assert not data
    assert os.path.exists(source), source

    print(">> Loading network:\n>>>> '{}'".format(source))
    official = load_checkpoint_any(source)
    meta = official.pop("meta")

    model_params = {
        "architecture": "cirnet",
        "cir_architecture": meta.pop("architecture"),
        "local_whitening": meta.pop("local_whitening", False),
        "pooling": meta.pop("pooling"),
        "regional": meta.pop("regional", False),
        "whitening": meta.pop("whitening"),
        "pretrained": True,
    }
    # materialize our native (flax) model state from the torch weights
    build_params = dict(model_params)
    build_params["pretrained"] = False
    model = initialize_model(build_params)
    torch_import.import_model_state(model, official.pop("state_dict"))

    net_state = {
        "type": "CirNetwork",
        "frozen": False,
        "network_params": {
            "model": model_params,
            "runtime": {
                "wrappers": "",
                "data": {
                    "mean_std": [meta.pop("mean"), meta.pop("std")],
                    "transforms": "pil2np | totensor | normalize",
                },
            },
        },
        "model_state": model.variables,
    }

    meta.pop("outputdim", None)
    meta.pop("Lw", None)
    assert not meta, meta

    if os.path.dirname(net) and not os.path.exists(os.path.dirname(net)):
        os.makedirs(os.path.dirname(net))
    save_state(net_state, net)
    return ({},)


def _compute_whitening(whitening, model, meta, image_size, ms):
    start = time.time()
    print(">> {}: Learning whitening...".format(whitening))

    db_root = os.path.join(get_data_root(), "train", whitening)
    ims_root = os.path.join(db_root, "ims")
    db_fn = os.path.join(db_root, "{}-whiten.pkl".format(whitening))
    with open(db_fn, "rb") as f:
        db = pickle.load(f)
    images = [cid2filename(cid, ims_root) for cid in db["cids"]]

    print(">> {}: Extracting...".format(whitening))
    wvecs = _extract(model, meta, images, image_size, ms)

    print(">> {}: Learning...".format(whitening))
    m, P = whitenlearn(wvecs, db["qidxs"], db["pidxs"])
    elapsed = time.time() - start
    return {"m": m, "P": P}, elapsed
