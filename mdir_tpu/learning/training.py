"""Epoch-loop training driver.

Capability parity with the reference's training orchestration (the
``EpochTraining`` registry entry, ``mdir/learning/training.py``), with an
independent structure: an :class:`EpochCursor` owns the epoch walk and
per-epoch host reseeding, :func:`_build_parts` assembles the optimization
components from the scenario spec, and resume policy lives in
``resume.py``. The externally pinned contract (e2e + resume tests):

* state payload ``{"type", "params", "optimizer_state", "epoch"}``
  (checkpoint-compatible with prior runs);
* per-epoch derived seeds ``seed + epoch``; scheduler stepped at the top
  of every epoch; epoch -1 means "not started";
* a resume may change only the total epoch count.

Determinism flags map to host RNG seeding alone — XLA programs are
deterministic by construction on TPU, so there is no cudnn-style toggle.
"""
import copy
import time
from dataclasses import dataclass

import numpy as np

from ..optim import (initialize_criterion, initialize_optimizer,
                     initialize_scheduler)
from ..tools.utils import indent
from .epoch_iteration import initialize_epoch_iteration
from .resume import merge_epoch_override, require


def reseed_host(seed):
    """Seed every host RNG that feeds data sampling (numpy + stdlib).

    Device-side randomness is keyed explicitly (jax PRNG keys derived per
    step), so host RNGs are the only ambient state to pin.
    """
    import random as pyrandom

    np.random.seed(int(seed) % (2 ** 32))
    pyrandom.seed(int(seed))


@dataclass
class EpochCursor:
    """Walks epochs ``-1 -> total-1``, reseeding the host per epoch.

    ``position`` is the last *started* epoch (-1 before the first); the
    derived seed for epoch e is ``base_seed + e`` so resumed runs continue
    the exact seed sequence.
    """

    total: int
    base_seed: int = None
    position: int = -1

    def start_next(self):
        if self.position + 1 >= self.total:
            raise StopIteration()
        self.position += 1
        if self.base_seed is not None:
            reseed_host(self.base_seed + self.position)
        return self.position

    @property
    def epochs_left(self):
        return self.total - self.position - 1


def _build_parts(spec, network, data, params_data, optimizer_state,
                 last_epoch):
    """Instantiate criterion/optimizer/scheduler/epoch-iteration from the
    scenario spec (consuming their keys; loop options remain)."""
    criterion = initialize_criterion(spec.pop("criterion"))

    optimizer = initialize_optimizer(network=network,
                                     params=spec.pop("optimizer"))
    if optimizer_state:
        optimizer.load_state_dict(optimizer_state)

    scheduler = initialize_scheduler(optimizer=optimizer,
                                     params=spec.pop("scheduler"),
                                     nepochs=spec["epochs"],
                                     last_epoch=last_epoch)

    iteration = initialize_epoch_iteration(
        spec.pop("epoch_iteration"), data=data, params_data=params_data,
        default_criterion=criterion,
        net_defaults=network.network_params.runtime.get("data", {}))

    return criterion, optimizer, scheduler, iteration


class EpochTraining:
    """Iterator over training epochs: yields ``(epoch, steps)`` pairs."""

    def __init__(self, declared_spec, components, cursor, deterministic):
        self.params = declared_spec  # verbatim scenario section (for state)
        self.criterion, self.optimizer, self.scheduler, \
            self.epoch_iteration = components
        self.cursor = cursor
        self.deterministic = deterministic
        # initial host seeding happens once, up front: epoch seeds derive
        # from base_seed, an unseeded run gets wall-clock entropy
        reseed_host(cursor.base_seed if cursor.base_seed is not None
                    else int(time.time()))

    def __next__(self):
        epoch = self.cursor.start_next()
        if self.scheduler is not None:
            self.scheduler.step()
        return epoch, self.epoch_iteration.steps(epoch)

    @property
    def epoch(self):
        return self.cursor.position

    @property
    def seed(self):
        return self.cursor.base_seed

    @property
    def remains_epochs(self):
        return self.cursor.epochs_left

    def state_dict(self):
        return {
            "type": type(self).__name__,
            "params": self.params,
            "optimizer_state": (self.optimizer.state_dict()
                                if self.optimizer else None),
            "epoch": self.cursor.position,
        }

    def __repr__(self):
        return ("%s (\n    epoch: %s\n    epoch_iteration: %s\n)"
                % (type(self).__name__, self.cursor.position,
                   indent(str(self.epoch_iteration))))


TRAININGS = {
    "EpochTraining": EpochTraining,
}


def initialize_training(params, network, data, params_data, device,
                        state=None):
    """Build (or resume) the training driver from its scenario section."""
    cls = TRAININGS[params.pop("type")]

    if state is None:
        spec, start_epoch, optimizer_state = params, -1, None
    else:
        require(state["type"] == cls.__name__, "training type",
                state["type"], cls.__name__)
        spec = merge_epoch_override(state["params"], params)
        # the NEXT epoch (state["epoch"]+1) must exist under the EFFECTIVE
        # (merged) total: checking the stored epoch against the stored
        # total is structurally always true (position <= epochs-1), so the
        # old guard could never fire and a completed run re-launched (or
        # resumed with a lowered epoch count) silently no-opped
        require(state["epoch"] + 1 < spec["epochs"],
                "resume point (already complete)", state["epoch"] + 1,
                spec["epochs"])
        start_epoch, optimizer_state = state["epoch"], \
            state["optimizer_state"]

    declared = copy.deepcopy(spec)
    working = dict(spec)
    components = _build_parts(working, network, data, params_data,
                              optimizer_state, start_epoch)
    # strict param consumption (reference idiom): no unknown keys survive
    assert set(working) == {"epochs", "deterministic", "seed"}, working.keys()
    cursor = EpochCursor(total=working["epochs"],
                         base_seed=working["seed"], position=start_epoch)
    return cls(declared, components, cursor,
               deterministic=working["deterministic"])
