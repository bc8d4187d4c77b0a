"""Joint translator+embedder training (the 'U-Net jointly N/D' analog):
SequentialNetwork under the train stage with an optimizer alternation
composition — translator trained, embedder frozen via optimizer None."""
import copy
import os
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def sfm_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("jointroot")
    os.environ["MDIR_TPU_ROOT"] = str(root)
    from PIL import Image

    rng = np.random.RandomState(5)
    db_dir = root / "data" / "train" / "retrieval-SfM-tiny"
    ims_root = db_dir / "ims"
    ims_root.mkdir(parents=True)

    cids = []
    for i in range(12):
        name = str(ims_root / ("im%03d.jpg" % i))
        Image.fromarray((rng.rand(48, 48, 3) * 255).astype(np.uint8)).save(name)
        cids.append(name)
    db = {"train": {"cids": cids, "cluster": [i // 2 for i in range(12)],
                    "qidxs": [0, 2, 4], "pidxs": [1, 3, 5]}}
    with open(db_dir / "retrieval-SfM-tiny.pkl", "wb") as handle:
        pickle.dump(db, handle)
    yield root
    os.environ.pop("MDIR_TPU_ROOT", None)


def test_joint_training_with_alternation(sfm_root, tmp_path):
    from mdir_tpu.stages.train import train

    mean_std = [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]
    params = {
        "network": {
            "type": "SequentialNetwork",
            "sequence": "translate,embed",
            "translate": {
                "type": "SingleNetwork",
                "path": None,
                "model": {"architecture": "pixelconv_regr", "in_channels": 3,
                          "out_channels": 3, "hidden": [8]},
                "initialize": {"weights": "he_normal", "seed": 0},
                "runtime": {"wrappers": "",
                            "data": {"mean_std": mean_std,
                                     "transforms": "pil2np | totensor | normalize"}},
            },
            "embed": {
                "type": "CirNetwork",
                "path": None,
                "model": {"architecture": "cirnet",
                          "cir_architecture": "alexnet",
                          "local_whitening": False, "pooling": "gem",
                          "regional": False, "whitening": False,
                          "pretrained": False},
                "initialize": {"weights": "default", "seed": 0},
                "runtime": {"wrappers": {"train": "cirfaketuplebatch",
                                         "eval": ""}},
            },
        },
        "learning": {
            "type": "TrainValLearning",
            "checkpoints": {"directory": str(tmp_path / "exp"),
                            "store_every": 0, "checkpoint_every": 1},
            "training": {
                "type": "EpochTraining",
                "epochs": 1,
                "deterministic": True,
                "seed": 0,
                "criterion": {"loss": "contrastive", "margin": 0.7,
                              "eps": 1e-6},
                "optimizer": {
                    "composition": {"type": "alternation",
                                    "alternate_iteration": None,
                                    "order": None},
                    "translate": {"algorithm": "adam", "lr": 1e-4,
                                  "weight_decay": 0},
                    "embed": None,  # frozen
                },
                "scheduler": None,
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
                            "image_size": 48,
                            "neg_num": 1,
                            "dataset_pkl": str(
                                sfm_root / "data" / "train" /
                                "retrieval-SfM-tiny" / "retrieval-SfM-tiny.pkl"),
                            "image_dir": None,
                            "query_size": 3,
                            "pool_size": 12},
                "loader": {"batch_size": 3, "num_workers": 0},
            },
        },
    }

    import jax

    from mdir_tpu.learning import initialize_learning

    learning = initialize_learning(copy.deepcopy(params), (), None)
    embed_before = jax.tree.map(
        np.asarray, learning.network.networks["embed"].model.params)
    translate_before = jax.tree.map(
        np.asarray, learning.network.networks["translate"].model.params)

    metadata, = train(copy.deepcopy(params), ())
    losses = metadata["metrics"]["train/learning/loss:total_avg.4"]
    assert len(losses) == 1 and np.isfinite(losses[0])


def test_alternation_counters():
    from mdir_tpu.optim.optimizers import Optimizer, OptimizerAlternation

    import jax
    import jax.numpy as jnp

    def mk():
        params = {"w": jnp.zeros((2,))}
        return Optimizer.create(
            {"params": params,
             "labels": jax.tree.map(lambda _: "default", params),
             "opts": {}}, "sgd", 0.1, 0.0, 0.0), params

    opt_a, pa = mk()
    opt_b, pb = mk()
    alt = OptimizerAlternation({"a": opt_a, "b": opt_b},
                               alternate_iteration=2, order="a,b")
    grads = {"w": jnp.ones((2,))}
    params = {"a": pa, "b": pb}
    # two steps on a, then switch to b
    for _ in range(2):
        assert alt.active_names() == ["a"]
        params = alt.apply(params, {"a": grads, "b": grads})
    assert alt.active_names() == ["b"]
    params = alt.apply(params, {"a": grads, "b": grads})
    # a moved twice, b once
    np.testing.assert_allclose(np.asarray(params["a"]["w"]), -0.2, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(params["b"]["w"]), -0.1, rtol=1e-5)

    state = alt.state_dict()
    alt2 = OptimizerAlternation({"a": mk()[0], "b": mk()[0]},
                                alternate_iteration=2, order="a,b")
    alt2.load_state_dict(state)
    assert alt2.current_iteration == 3 and alt2.current_optimizer == 1


def test_joint_training_alternation_zero_sharded(sfm_root, tmp_path):
    """The composed path under ZeRO-sharded DP: a scenario-level
    ``runtime: param_sharding: zero`` routes to the tail subnet, surfaces
    through the composed network_params, and pairs reduce-scattered
    gradients with OptimizerAlternation.shard_state — with the embedder
    frozen (optimizer None), only the translator's state shards."""
    import jax

    from mdir_tpu.stages.train import train

    mean_std = [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]
    params = {
        "network": {
            "type": "SequentialNetwork",
            "sequence": "translate,embed",
            "runtime": {"param_sharding": "zero"},
            "translate": {
                "type": "SingleNetwork",
                "path": None,
                "model": {"architecture": "pixelconv_regr", "in_channels": 3,
                          "out_channels": 3, "hidden": [8]},
                "initialize": {"weights": "he_normal", "seed": 0},
                "runtime": {"wrappers": "",
                            "data": {"mean_std": mean_std,
                                     "transforms":
                                         "pil2np | totensor | normalize"}},
            },
            "embed": {
                "type": "CirNetwork",
                "path": None,
                "model": {"architecture": "cirnet",
                          "cir_architecture": "alexnet",
                          "local_whitening": False, "pooling": "gem",
                          "regional": False, "whitening": False,
                          "pretrained": False},
                "initialize": {"weights": "default", "seed": 0},
                "runtime": {"wrappers": {"train": "cirfaketuplebatch",
                                         "eval": ""}},
            },
        },
        "learning": {
            "type": "TrainValLearning",
            "checkpoints": {"directory": str(tmp_path / "exp_zero"),
                            "store_every": 0, "checkpoint_every": 1},
            "training": {
                "type": "EpochTraining",
                "epochs": 1,
                "deterministic": True,
                "seed": 0,
                "criterion": {"loss": "contrastive", "margin": 0.7,
                              "eps": 1e-6},
                "optimizer": {
                    "composition": {"type": "alternation",
                                    "alternate_iteration": None,
                                    "order": None},
                    "translate": {"algorithm": "adam", "lr": 1e-4,
                                  "weight_decay": 0},
                    "embed": None,  # frozen
                },
                "scheduler": None,
                "epoch_iteration": {
                    "type": "SupervisedEpoch",
                    "data": "train",
                    "criterion": "default",
                    "batch_average": False,
                    "fakebatch": True,
                    # 3 tuples x 3 images = 9 images over a 3-device mesh
                    "parallel": {"data": 3},
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
                            "image_size": 48,
                            "neg_num": 1,
                            "dataset_pkl": str(
                                sfm_root / "data" / "train" /
                                "retrieval-SfM-tiny" / "retrieval-SfM-tiny.pkl"),
                            "image_dir": None,
                            "query_size": 3,
                            "pool_size": 12},
                "loader": {"batch_size": 3, "num_workers": 0},
            },
        },
    }

    metadata, = train(copy.deepcopy(params), ())
    losses = metadata["metrics"]["train/learning/loss:total_avg.4"]
    assert len(losses) == 1 and np.isfinite(losses[0])
