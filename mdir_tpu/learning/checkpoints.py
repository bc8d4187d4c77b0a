"""Checkpoint store: pytree states in the reference's epochs/ role layout.

Parity with ``mdir/learning/checkpoints.py``: per-network files
``<name>_epoch_%02d.ckpt`` with ``_bestsofar/_best/_last/_frozen/_notrain``
symlinks, two cadences (``store_every`` permanent vs ``checkpoint_every``
rolling with previous-checkpoint GC), frozen networks stored once and
symlinked, training state written atomically via tmp-rename, multi-network
states via ``_network_names``, and backwards-scanning resume.

Serialization is msgpack over numpy pytrees (flax.serialization) — no torch
at runtime. Reference ``.pth`` torch pickles are still *read* transparently
(legacy interop; torch used as an offline converter only).
"""
import os
import pickle
from pathlib import Path

import numpy as np
from flax import serialization

from ..tools.utils import load_url

SUFFIX_NOTRAIN = "_notrain.ckpt"
SUFFIX_FROZEN = "_frozen.ckpt"
SUFFIX_EPOCH = "_epoch_%02d.ckpt"
SUFFIX_BEST_SO_FAR = "_bestsofar.ckpt"
SUFFIX_BEST = "_best.ckpt"
SUFFIX_LAST = "_last.ckpt"

FNAME_TRAINING = "learning_epoch_%02d.ckpt"


class _Cadence:
    """Which persistence actions epoch N triggers.

    Cadence rules (reference semantics, `mdir/learning/checkpoints.py:32-45`):
    ``store_every`` hits are permanent; ``checkpoint_every`` hits roll — the
    previous rolling checkpoint (``prev_epoch1``) is garbage-collected unless
    it was also a store hit. The final epoch always persists.
    """

    def __init__(self, epoch, store_every, checkpoint_every, is_last):
        self.epoch1 = epoch + 1
        self.stored = bool(store_every) and self.epoch1 % store_every == 0
        aligned = bool(checkpoint_every) \
            and self.epoch1 % checkpoint_every == 0
        self.checkpointed = aligned or is_last
        self.persists = self.checkpointed or self.stored
        self.prev_epoch1 = None
        self.prev_is_stored = False
        if self.checkpointed and checkpoint_every:
            back = self.epoch1 % checkpoint_every or checkpoint_every
            self.prev_epoch1 = self.epoch1 - back
            self.prev_is_stored = bool(store_every) \
                and self.prev_epoch1 % store_every == 0


def save_state(state, path):
    """Serialize a nested dict of numpy arrays / primitives."""
    path = Path(path)
    blob = serialization.msgpack_serialize(_normalize(state))
    with open(path, "wb") as handle:
        handle.write(blob)


def _normalize(obj):
    if isinstance(obj, dict):
        return {str(k): _normalize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_normalize(v) for v in obj]
    if isinstance(obj, Path):
        return str(obj)
    if hasattr(obj, "__array__") and not isinstance(obj, (str, bytes)):
        return np.asarray(obj)
    return obj


def load_state(path):
    with open(path, "rb") as handle:
        blob = handle.read()
    return serialization.msgpack_restore(blob)


def load_checkpoint_any(path):
    """Load a checkpoint file: ours (msgpack) or a reference torch .pth."""
    path = str(path)
    with open(path, "rb") as handle:
        magic = handle.read(2)
    if magic == b"PK" or path.endswith((".pth", ".pt")):
        from ..models.torch_import import load_torch_pickle

        return load_torch_pickle(path)
    try:
        return load_state(path)
    except Exception:
        with open(path, "rb") as handle:
            return pickle.load(handle)


def _expand_multinet(checkpoint, load_sibling=None):
    """Flatten a multi-network state into ``{name: state}``.

    Two on-disk forms (reference `checkpoints.py:46,111-125`): member states
    embedded under ``_networks_included`` (single-file checkpoints), or
    ``_network_names`` naming sibling files in an ``epochs/`` directory —
    resolved through ``load_sibling`` when given.
    """
    states = {"net": checkpoint}
    for name, state in checkpoint.pop("_networks_included", {}).items():
        assert name not in states
        states[name] = state
    names = checkpoint.pop("_network_names", []) if load_sibling else []
    for name in names:
        assert name not in states
        states[name] = load_sibling(name)
    return states


class Checkpoints:

    def __init__(self, directory, store_every, checkpoint_every):
        self.directory = Path(directory) / "epochs"
        self.store_every = store_every
        self.checkpoint_every = checkpoint_every

    def _file(self, name):
        return self.directory / name

    def save_notrain(self, networks_state):
        os.makedirs(self.directory, exist_ok=True)
        for key, state in networks_state.items():
            assert "/" not in key
            save_state(state, self._file(key + SUFFIX_NOTRAIN))
            for role in (SUFFIX_BEST, SUFFIX_LAST):
                # re-running an epochs==0 stage into the same directory
                # must refresh the role links, not FileExistsError
                link = self._file(key + role)
                link.unlink(missing_ok=True)
                link.symlink_to(key + SUFFIX_NOTRAIN)

    def save_epoch(self, networks_state, training_state, epoch, is_best, is_last):
        assert epoch >= 0
        when = _Cadence(epoch, self.store_every, self.checkpoint_every,
                        is_last)
        os.makedirs(self.directory, exist_ok=True)

        if len(networks_state) > 1:
            networks_state["net"]["_network_names"] = [
                name for name in networks_state if name != "net"]

        for key, state in networks_state.items():
            assert "/" not in key
            self._place_network(key, state, when, is_best, is_last)
        if when.persists:
            self._write_training(training_state, when)
        for key in networks_state:
            self._promote_and_roll(key, when, is_last)

    def _place_network(self, key, state, when, is_best, is_last):
        """Write (or symlink) this epoch's network file plus its role links."""
        frozen_name = key + SUFFIX_FROZEN
        if state["frozen"] and not self._file(frozen_name).exists():
            save_state(state, self._file(frozen_name))

        epoch_name = key + SUFFIX_EPOCH % when.epoch1
        if when.persists:
            if state["frozen"]:
                self._file(epoch_name).symlink_to(frozen_name)
            else:
                save_state(state, self._file(epoch_name))

        roles = [SUFFIX_BEST_SO_FAR] * is_best + [SUFFIX_LAST] * is_last
        for role in roles:
            link = self._file(key + role)
            if link.exists() or link.is_symlink():
                link.unlink()
            if state["frozen"]:
                link.symlink_to(frozen_name)
            elif when.persists:
                link.symlink_to(epoch_name)
            else:
                save_state(state, link)  # role file carries the only copy

    def _write_training(self, training_state, when):
        """Training state lands via tmp-file + atomic rename; the previous
        rolling checkpoint's training file is dropped."""
        final = self._file(FNAME_TRAINING % when.epoch1)
        tmp = Path(str(final) + ".tmp")
        save_state(training_state, tmp)
        tmp.rename(final)
        if when.checkpointed and when.prev_epoch1:
            stale = self._file(FNAME_TRAINING % when.prev_epoch1)
            if stale.exists():
                stale.unlink()

    def _promote_and_roll(self, key, when, is_last):
        """Resurrect a finalized _best into _bestsofar (resume), GC the
        previous rolling network file (rescuing it into _bestsofar if it IS
        the best), and finalize _bestsofar -> _best on the last epoch."""
        best = self._file(key + SUFFIX_BEST_SO_FAR)
        if not best.exists():
            retired = self._file(key + SUFFIX_BEST)
            if retired.exists():
                retired.rename(best)

        rolls = when.checkpointed and when.prev_epoch1 \
            and not when.prev_is_stored
        if rolls:
            victim = self._file(key + SUFFIX_EPOCH % when.prev_epoch1)
            if victim.exists():
                # compare RESOLVED paths on both sides: an unresolved
                # victim under a relative checkpoint directory never
                # string-equals best.resolve(), and the rescue branch
                # would be skipped — deleting the best checkpoint's target
                # and leaving a dangling _bestsofar symlink (data loss;
                # the reference shares this flaw, checkpoints.py:100)
                if best.exists() and victim.resolve() == best.resolve():
                    best.unlink()
                    victim.rename(best)
                else:
                    victim.unlink()

        if is_last and best.exists():
            best.rename(self._file(key + SUFFIX_BEST))

    @staticmethod
    def _load_epoch_network(directory, suffix):
        sibling = lambda name: load_checkpoint_any(
            Path(directory) / (name + suffix))
        return _expand_multinet(sibling("net"), sibling)

    def _load_epoch_training(self, fname):
        return load_checkpoint_any(self.directory / fname)

    def load_latest_epoch(self, nepochs):
        if not self.directory.exists():
            return None
        for epoch in reversed(range(nepochs)):
            epoch1 = epoch + 1
            training_path = self.directory / (FNAME_TRAINING % epoch1)
            if training_path.exists():
                network = self._load_epoch_network(self.directory,
                                                   SUFFIX_EPOCH % epoch1)
                training = self._load_epoch_training(FNAME_TRAINING % epoch1)
                return network, training
        return None

    @classmethod
    def load_network(cls, directory):
        """Load a network state from a dir (best), file, or URL."""
        if str(directory).startswith(("http://", "https://")):
            from ..tools.utils import get_data_root

            directory = load_url(directory, cache_dir=get_data_root() + "/networks")
        else:
            path = Path(directory)
            if path.is_dir():
                suffix = SUFFIX_BEST
                if not (path / ("net" + suffix)).exists() and \
                        (path / "net_best.pth").exists():
                    suffix = "_best.pth"
                return cls._load_epoch_network(path, suffix)

        return _expand_multinet(load_checkpoint_any(directory))

    @classmethod
    def load_checkpoint_file(cls, path):
        """Single checkpoint file/URL -> raw checkpoint dict (the 'net' level)."""
        return cls.load_network(path)["net"]
