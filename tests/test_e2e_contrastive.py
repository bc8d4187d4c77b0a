"""End-to-end contrastive training with hard-negative re-mining.

The flagship path: CirTuples over a synthetic retrieval-SfM-style db,
per-epoch mining with the current network (batched extraction + on-device
ranking + cluster-constrained selection), tuple batches through the
contrastive loss on D x N columns, CirNetwork param groups (pool p at 10x lr,
0 wd), and a gamma scheduler.
"""
import copy
import os
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def sfm_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sfmroot")
    os.environ["MDIR_TPU_ROOT"] = str(root)
    from PIL import Image

    rng = np.random.RandomState(3)
    db_dir = root / "data" / "train" / "retrieval-SfM-tiny"
    ims_root = db_dir / "ims"
    ims_root.mkdir(parents=True)

    n_images = 16
    cids = []
    for i in range(n_images):
        # absolute-path cids skip the hashed layout (cid2filename)
        name = str(ims_root / ("im%03d.jpg" % i))
        arr = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(name)
        cids.append(name)

    clusters = [i // 2 for i in range(n_images)]  # 8 clusters of 2
    qidxs = [0, 2, 4, 6]
    pidxs = [1, 3, 5, 7]
    db = {"train": {"cids": cids, "cluster": clusters,
                    "qidxs": qidxs, "pidxs": pidxs},
          "val": {"cids": cids, "cluster": clusters,
                  "qidxs": qidxs, "pidxs": pidxs}}
    with open(db_dir / "retrieval-SfM-tiny.pkl", "wb") as handle:
        pickle.dump(db, handle)

    yield root
    os.environ.pop("MDIR_TPU_ROOT", None)


def test_contrastive_training_with_mining(sfm_root, tmp_path):
    from mdir_tpu.stages.train import train

    mean_std = [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]
    params = {
        "network": {
            "type": "CirNetwork",
            "path": None,
            "model": {"architecture": "cirnet", "cir_architecture": "alexnet",
                      "local_whitening": False, "pooling": "gem",
                      "regional": False, "whitening": False,
                      "pretrained": False},
            "initialize": {"weights": "default", "seed": 0},
            "runtime": {
                "wrappers": {"train": "cirfaketuplebatch", "eval": ""},
                "data": {"mean_std": mean_std,
                         "transforms": "pil2np | totensor | normalize"},
            },
        },
        "learning": {
            "type": "TrainValLearning",
            "checkpoints": {"directory": str(tmp_path / "exp"),
                            "store_every": 0, "checkpoint_every": 1},
            "training": {
                "type": "EpochTraining",
                "epochs": 2,
                "deterministic": True,
                "seed": 0,
                "criterion": {"loss": "contrastive", "margin": 0.7,
                              "eps": 1e-6},
                "optimizer": {"algorithm": "adam", "lr": 1e-6,
                              "weight_decay": 1e-6},
                "scheduler": {"algorithm": "gamma", "gamma": "exp(-0.01)"},
                "epoch_iteration": {
                    "type": "SupervisedEpoch",
                    "data": "train",
                    "criterion": "default",
                    "batch_average": False,
                    "fakebatch": True,
                },
            },
            "validation": False,
        },
        "output": {"learning": {"progress": {"print_each": 100}}},
        "data": {
            "train": {
                "mean_std": mean_std,
                "transforms": "pil2np | totensor | normalize",
                "dataset": {"name": "CirTuples",
                            "dataset": "retrieval-SfM-tiny",
                            "split": "train",
                            "image_size": 64,
                            "neg_num": 2,
                            "dataset_pkl": str(
                                sfm_root / "data" / "train" /
                                "retrieval-SfM-tiny" / "retrieval-SfM-tiny.pkl"),
                            "image_dir": None,
                            "query_size": 4,
                            "pool_size": 16},
                "loader": {"batch_size": 2, "num_workers": 0},
            },
        },
    }

    metadata, = train(copy.deepcopy(params), ())
    losses = metadata["metrics"]["train/learning/loss:total_avg.4"]
    assert len(losses) == 2
    assert np.isfinite(np.asarray(losses)).all()
    assert all(l > 0 for l in losses)
    # mining stats were logged
    assert "train/learning/data_mining:average_negative_distance_avg.4" \
        in metadata["metrics"]


def test_gem_p_param_group_lr(sfm_root):
    """CirNetwork assigns the pool p a 10x-lr, 0-wd optimizer group."""
    from mdir_tpu.learning.network import CirNetwork
    from mdir_tpu.models import initialize_model
    from mdir_tpu.optim.optimizers import initialize_optimizer

    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": "alexnet",
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})
    network = CirNetwork(model, CirNetwork.NetworkParams(
        model={}, runtime={"wrappers": ""}))
    opt = initialize_optimizer(network, {"algorithm": "sgd", "lr": 0.01,
                                         "momentum": 0.9, "weight_decay": 1e-4})
    lrs = opt.learning_rates
    assert abs(lrs["pool"] - 0.1) < 1e-6
    assert abs(lrs["default"] - 0.01) < 1e-6


def test_contrastive_training_data_parallel(sfm_root, tmp_path):
    """DP training over the 8-device CPU mesh: same API, sharded batches."""
    import copy as _copy

    from mdir_tpu.stages.train import train

    mean_std = [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]
    params = {
        "network": {
            "type": "CirNetwork",
            "path": None,
            "model": {"architecture": "cirnet", "cir_architecture": "alexnet",
                      "local_whitening": False, "pooling": "gem",
                      "regional": False, "whitening": False,
                      "pretrained": False},
            "initialize": {"weights": "default", "seed": 0},
            "runtime": {
                "wrappers": {"train": "cirfaketuplebatch", "eval": ""},
                "data": {"mean_std": mean_std,
                         "transforms": "pil2np | totensor | normalize"},
            },
        },
        "learning": {
            "type": "TrainValLearning",
            "checkpoints": {"directory": str(tmp_path / "exp_dp"),
                            "store_every": 0, "checkpoint_every": 1},
            "training": {
                "type": "EpochTraining",
                "epochs": 1,
                "deterministic": True,
                "seed": 0,
                "criterion": {"loss": "contrastive", "margin": 0.7,
                              "eps": 1e-6},
                "optimizer": {"algorithm": "adam", "lr": 1e-6,
                              "weight_decay": 0},
                "scheduler": None,
                "epoch_iteration": {
                    "type": "SupervisedEpoch",
                    "data": "train",
                    "criterion": "default",
                    "batch_average": False,
                    "fakebatch": True,
                    "parallel": {"data": 4},  # 4 tuples x 4 images = 16 imgs
                },
            },
            "validation": False,
        },
        "output": {"learning": {"progress": {"print_each": 100}}},
        "data": {
            "train": {
                "mean_std": mean_std,
                "transforms": "pil2np | totensor | normalize",
                "dataset": {"name": "CirTuples",
                            "dataset": "retrieval-SfM-tiny",
                            "split": "train",
                            "image_size": 64,
                            "neg_num": 2,
                            "dataset_pkl": str(
                                sfm_root / "data" / "train" /
                                "retrieval-SfM-tiny" / "retrieval-SfM-tiny.pkl"),
                            "image_dir": None,
                            "query_size": 4,
                            "pool_size": 16},
                "loader": {"batch_size": 4, "num_workers": 0},
            },
        },
    }
    metadata, = train(_copy.deepcopy(params), ())
    losses = metadata["metrics"]["train/learning/loss:total_avg.4"]
    assert len(losses) == 1 and np.isfinite(losses[0]) and losses[0] > 0


def test_contrastive_training_device_clahe_chain(sfm_root, tmp_path):
    """The train stage with a CLAHE transform chain engages the device
    preprocessing path end-to-end: tuple items ship as raw uint8 (+ host L
    plane) and the chain — CLAHE included — runs fused inside the train-step
    program. A wiring regression would feed 4-channel uint8 to the trunk and
    crash; finite decreasing-capable losses pin the path works."""
    import copy as _copy

    from mdir_tpu.stages.train import train

    mean_std = [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]
    params = {
        "network": {
            "type": "CirNetwork",
            "path": None,
            "model": {"architecture": "cirnet", "cir_architecture": "alexnet",
                      "local_whitening": False, "pooling": "gem",
                      "regional": False, "whitening": False,
                      "pretrained": False},
            "initialize": {"weights": "default", "seed": 0},
            "runtime": {
                "wrappers": {"train": "cirfaketuplebatch", "eval": ""},
                "data": {"mean_std": mean_std,
                         "transforms":
                             "pil2np | apply_clahe | totensor | normalize"},
            },
        },
        "learning": {
            "type": "TrainValLearning",
            "checkpoints": {"directory": str(tmp_path / "exp_clahe"),
                            "store_every": 0, "checkpoint_every": 1},
            "training": {
                "type": "EpochTraining",
                "epochs": 1,
                "deterministic": True,
                "seed": 0,
                "criterion": {"loss": "contrastive", "margin": 0.7,
                              "eps": 1e-6},
                "optimizer": {"algorithm": "adam", "lr": 1e-6,
                              "weight_decay": 0},
                "scheduler": {"algorithm": "const"},
                "epoch_iteration": {
                    "type": "SupervisedEpoch",
                    "data": "train",
                    "criterion": "default",
                    "batch_average": True,
                    "fakebatch": True,
                },
            },
            "validation": False,
        },
        "output": {"learning": {"progress": {"print_each": 100}}},
        "data": {
            "train": {
                "dataset": {"name": "CirTuples",
                            "dataset": "retrieval-SfM-tiny",
                            "split": "train",
                            "image_size": 64,
                            "neg_num": 2,
                            "dataset_pkl": str(
                                sfm_root / "data" / "train" /
                                "retrieval-SfM-tiny" / "retrieval-SfM-tiny.pkl"),
                            "image_dir": None,
                            "query_size": 4,
                            "pool_size": 16},
                "loader": {"batch_size": 2, "num_workers": 0},
            },
        },
    }

    metadata, = train(_copy.deepcopy(params), ())
    losses = metadata["metrics"]["train/learning/loss:total_avg.4"]
    assert len(losses) == 1 and np.isfinite(np.asarray(losses)).all()


def test_mining_pool_exhaustion_raises_clearly(sfm_root):
    """When the negative pool has fewer distinct-cluster candidates than
    nnum, mining must fail with an actionable error (pool_size/neg_num),
    not an IndexError past the rank matrix (the reference's unbounded walk,
    cirtorch traindataset.py:178-271, crashes opaquely the same way)."""
    from mdir_tpu.data.datasets import TuplesDataset
    from mdir_tpu.learning.network import CirNetwork
    from mdir_tpu.models import initialize_model

    from mdir_tpu.data.transforms import initialize_transforms

    db_pkl = str(sfm_root / "data" / "train" / "retrieval-SfM-tiny"
                 / "retrieval-SfM-tiny.pkl")
    mean_std = [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]
    transform = initialize_transforms("pil2np | totensor | normalize",
                                      mean_std)
    # 16 images in 8 clusters: a query's pool holds at most 7 other
    # clusters, so nnum=10 cannot be satisfied
    dataset = TuplesDataset("retrieval-SfM-tiny", "train", imsize=64,
                            nnum=10, qsize=1, poolsize=16,
                            transform=transform, dataset_pkl=db_pkl)

    e_params = {"architecture": "cirnet", "cir_architecture": "alexnet",
                "local_whitening": False, "pooling": "gem",
                "regional": False, "whitening": False, "pretrained": False}
    network = CirNetwork(
        initialize_model(dict(e_params)),
        CirNetwork.NetworkParams(
            model=e_params,
            runtime={"wrappers": "",
                     "data": {"mean_std": mean_std,
                              "transforms":
                                  "pil2np | totensor | normalize"}})).eval()

    np.random.seed(0)
    with pytest.raises(ValueError, match="exhausted the pool"):
        dataset.create_epoch_tuples(network)


def test_cirnetwork_pathless_resume_consistency():
    """Resuming a pathless CirNetwork yaml that relied on the documented
    mean/std injection must pass the consistency check (confirmed repro:
    the checkpointed runtime carries the injected data defaults the fresh
    yaml omits), and a genuinely mismatched model must FAIL it (the check
    used to be skipped whenever the conventional "path": null key was
    present)."""
    import copy

    from mdir_tpu.learning.network import CirNetwork, initialize_network
    from mdir_tpu.models import initialize_model

    e_params = {"architecture": "cirnet", "cir_architecture": "alexnet",
                "local_whitening": False, "pooling": "gem",
                "regional": False, "whitening": False, "pretrained": False}
    # yaml WITHOUT a data section: CirNetwork injects model mean/std
    yaml_params = {"type": "CirNetwork", "path": None,
                   "model": dict(e_params),
                   "initialize": {"weights": "default", "seed": 0},
                   "runtime": {"wrappers": ""}}
    network = CirNetwork(
        initialize_model(dict(e_params)),
        CirNetwork.NetworkParams(model=dict(e_params),
                                 runtime={"wrappers": ""}))
    state = network.state_dict()

    resumed = initialize_network(copy.deepcopy(yaml_params), state=state)
    assert isinstance(resumed, CirNetwork)

    wrong = copy.deepcopy(yaml_params)
    wrong["model"]["pooling"] = "mac"
    with pytest.raises(AssertionError):
        initialize_network(wrong, state=network.state_dict())


def test_mining_train_handoff_exact_and_active(sfm_root, tmp_path,
                                               monkeypatch):
    """MDIR_TPU_DEVICE_CACHE_MB: training batches assemble from the entries
    mining just shipped (the handoff actually fires) and the training losses
    are IDENTICAL to the uncached run (deterministic seed -> same tuples;
    assembly is bit-exact)."""
    from mdir_tpu.parallel.device_cache import DeviceImageCache
    from mdir_tpu.stages.train import train

    def params(exp):
        mean_std = [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]
        return {
            "network": {
                "type": "CirNetwork", "path": None,
                "model": {"architecture": "cirnet",
                          "cir_architecture": "alexnet",
                          "local_whitening": False, "pooling": "gem",
                          "regional": False, "whitening": False,
                          "pretrained": False},
                "initialize": {"weights": "default", "seed": 0},
                "runtime": {
                    "wrappers": {"train": "cirfaketuplebatch", "eval": ""},
                    "data": {"mean_std": mean_std,
                             "transforms": "pil2np | totensor | normalize"},
                },
            },
            "learning": {
                "type": "TrainValLearning",
                "checkpoints": {"directory": str(tmp_path / exp),
                                "store_every": 0, "checkpoint_every": 1},
                "training": {
                    "type": "EpochTraining", "epochs": 2,
                    "deterministic": True, "seed": 0,
                    "criterion": {"loss": "contrastive", "margin": 0.7,
                                  "eps": 1e-6},
                    "optimizer": {"algorithm": "adam", "lr": 1e-6,
                                  "weight_decay": 1e-6},
                    "scheduler": {"algorithm": "gamma",
                                  "gamma": "exp(-0.01)"},
                    "epoch_iteration": {
                        "type": "SupervisedEpoch", "data": "train",
                        "criterion": "default", "batch_average": False,
                        "fakebatch": True,
                    },
                },
                "validation": False,
            },
            "output": {"learning": {"progress": {"print_each": 100}}},
            "data": {
                "train": {
                    "mean_std": mean_std,
                    "transforms": "pil2np | totensor | normalize",
                    "dataset": {"name": "CirTuples",
                                "dataset": "retrieval-SfM-tiny",
                                "split": "train", "image_size": 64,
                                "neg_num": 2,
                                "dataset_pkl": str(
                                    sfm_root / "data" / "train" /
                                    "retrieval-SfM-tiny" /
                                    "retrieval-SfM-tiny.pkl"),
                                "image_dir": None,
                                "query_size": 4, "pool_size": 16},
                    "loader": {"batch_size": 2, "num_workers": 0},
                },
            },
        }

    monkeypatch.delenv("MDIR_TPU_DEVICE_CACHE_MB", raising=False)
    base, = train(params("exp_nocache"), ())
    base_losses = base["metrics"]["train/learning/loss:total_avg.4"]

    assembled = []
    orig = DeviceImageCache.assemble_train_batch

    def spy(self, flat, **kw):
        assembled.append(len(flat))
        return orig(self, flat, **kw)

    monkeypatch.setattr(DeviceImageCache, "assemble_train_batch", spy)
    monkeypatch.setenv("MDIR_TPU_DEVICE_CACHE_MB", "64")
    cached, = train(params("exp_cache"), ())
    cached_losses = cached["metrics"]["train/learning/loss:total_avg.4"]

    assert assembled, "handoff never fired (no device-assembled batches)"
    np.testing.assert_allclose(cached_losses, base_losses, rtol=0, atol=0)
