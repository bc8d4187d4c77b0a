"""Scenario overlay semantics (key*/key+, int list keys, list-merge errors)."""
import pytest

from mdir_tpu.config import dict_deep_overlay


def test_deep_merge():
    a = {"x": {"y": 1, "z": 2}, "k": [1, 2]}
    b = {"x": {"y": 10}}
    out = dict_deep_overlay(a, b)
    assert out == {"x": {"y": 10, "z": 2}, "k": [1, 2]}


def test_replace_operator():
    a = {"x": {"y": 1, "z": 2}}
    b = {"x*": {"y": 10}}
    assert dict_deep_overlay(a, b) == {"x": {"y": 10}}


def test_append_operator():
    a = {"k": [1, 2]}
    b = {"k+": [3]}
    assert dict_deep_overlay(a, b) == {"k": [1, 2, 3]}


def test_int_keys_index_lists():
    a = {"k": [{"a": 1}, {"b": 2}]}
    b = {"k": {1: {"b": 20}}}
    assert dict_deep_overlay(a, b) == {"k": [{"a": 1}, {"b": 20}]}


def test_implicit_list_merge_refused():
    with pytest.raises(ValueError):
        dict_deep_overlay({"k": [1]}, {"k": [2]})


def test_type_mismatch_replaces():
    assert dict_deep_overlay({"k": [1]}, {"k": "str"}) == {"k": "str"}


def test_multiway():
    out = dict_deep_overlay({"a": 1}, {"b": 2}, {"a": 3})
    assert out == {"a": 3, "b": 2}


def test_load_scenario_overlays_files(tmp_path):
    """load_scenario: a sequence of yaml files overlays into one dict (the
    eval.py shortcut mechanism as a library API)."""
    import yaml

    from mdir_tpu.config import load_scenario

    a = tmp_path / "a.yml"
    b = tmp_path / "b.yml"
    yaml.safe_dump({"network": {"path": "x"}, "data": {"k": 1}},
                   open(a, "w"))
    yaml.safe_dump({"data": {"k": 2, "extra": True}}, open(b, "w"))
    scenario = load_scenario([str(a), str(b)])
    assert scenario == {"network": {"path": "x"},
                        "data": {"k": 2, "extra": True}}
