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


def test_empty_overlay_file_is_noop(tmp_path):
    """A comment-only / empty yaml overlay must not wipe the accumulated
    scenario (yaml.safe_load returns None, which used to replace the whole
    dict); `key: null` INSIDE a file still replaces as usual."""
    from mdir_tpu.config.overlay import dict_deep_overlay, load_scenario

    base = tmp_path / "base.yml"
    base.write_text("a: 1\nb: {c: 2}\n")
    notes = tmp_path / "notes.yml"
    notes.write_text("# just a comment\n")
    assert load_scenario([str(base), str(notes)]) == {"a": 1, "b": {"c": 2}}

    nullify = tmp_path / "null.yml"
    nullify.write_text("b: null\n")
    assert load_scenario([str(base), str(nullify)]) == {"a": 1, "b": None}

    # in-dict None values still replace through the deep merge
    assert dict_deep_overlay({"x": {"y": 1}}, {"x": {"y": None}}) \
        == {"x": {"y": None}}


def test_append_overlay_missing_base_key_errors_clearly():
    """'key+' into a base that never defined the key raises an actionable
    error, not a bare KeyError."""
    from mdir_tpu.config.overlay import dict_deep_overlay

    with pytest.raises(ValueError, match="never defined"):
        dict_deep_overlay({}, {"lst+": [1]})
    assert dict_deep_overlay({"lst": [0]}, {"lst+": [1]}) == {"lst": [0, 1]}
