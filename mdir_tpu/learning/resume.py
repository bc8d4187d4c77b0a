"""Resume-consistency helpers shared by the training/learning drivers.

The reference framework guards checkpoint resume with hard asserts: a run
may only continue if its scenario matches the one that produced the
checkpoint, with a single allowance — the total epoch count may be raised
or lowered (``mdir/learning/training.py:91-97``,
``mdir/learning/learning.py:46-50``). These helpers centralize that policy
so the drivers themselves stay free of state-dict plumbing.
"""


def require(condition, what, stored, requested):
    """Uniform resume-mismatch error with both sides in the message."""
    if not condition:
        raise AssertionError("resume %s mismatch: %s != %s"
                             % (what, stored, requested))


def merge_epoch_override(stored_params, requested_params):
    """Return stored params with the requested epoch count applied.

    Every other key must match exactly (the single reference-pinned
    allowance: only ``epochs`` may change across a resume). With no
    requested params, the stored ones win unchanged.
    """
    if requested_params is None:
        return stored_params
    drop = lambda d: {k: v for k, v in d.items() if k != "epochs"}
    require(drop(stored_params) == drop(requested_params),
            "training params", drop(stored_params), drop(requested_params))
    merged = dict(stored_params)
    merged["epochs"] = requested_params["epochs"]
    return merged


def check_session_consistency(train_stats, scenario_params):
    """A resumed learning session must have identical validation + data
    sections to the checkpointed one."""
    require(train_stats["validation"]["params"]
            == scenario_params["learning"]["validation"],
            "validation params", train_stats["validation"]["params"],
            scenario_params["learning"]["validation"])
    require(train_stats["datasets"] == scenario_params["data"],
            "dataset params", train_stats["datasets"],
            scenario_params["data"])
