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


class Checkpoints:

    def __init__(self, directory, store_every, checkpoint_every):
        self.directory = Path(directory) / "epochs"
        self.store_every = store_every
        self.checkpoint_every = checkpoint_every

    def save_notrain(self, networks_state):
        os.makedirs(self.directory, exist_ok=True)
        for key, state in networks_state.items():
            assert "/" not in key
            save_state(state, self.directory / (key + SUFFIX_NOTRAIN))
            (self.directory / (key + SUFFIX_BEST)).symlink_to(key + SUFFIX_NOTRAIN)
            (self.directory / (key + SUFFIX_LAST)).symlink_to(key + SUFFIX_NOTRAIN)

    def save_epoch(self, networks_state, training_state, epoch, is_best, is_last):
        assert epoch >= 0
        epoch1 = epoch + 1
        is_checkpointed = (self.checkpoint_every > 0
                           and epoch1 % self.checkpoint_every == 0) or is_last
        is_stored = self.store_every > 0 and epoch1 % self.store_every == 0
        if is_checkpointed:
            last_checkpoint = epoch - (epoch1 % self.checkpoint_every
                                       or self.checkpoint_every)
            last_is_stored = self.store_every > 0 and \
                (last_checkpoint + 1) % self.store_every == 0

        os.makedirs(self.directory, exist_ok=True)

        if len(networks_state) > 1:
            networks_state["net"]["_network_names"] = [
                x for x in networks_state if x != "net"]

        for key, state in networks_state.items():
            assert "/" not in key
            if state["frozen"]:
                frozen_path = self.directory / (key + SUFFIX_FROZEN)
                if not frozen_path.exists():
                    save_state(state, frozen_path)

            epoch_path = self.directory / (key + SUFFIX_EPOCH % epoch1)
            if is_checkpointed or is_stored:
                if state["frozen"]:
                    epoch_path.symlink_to(key + SUFFIX_FROZEN)
                else:
                    save_state(state, epoch_path)

            shortcut_paths = []
            if is_best:
                shortcut_paths.append(self.directory / (key + SUFFIX_BEST_SO_FAR))
            if is_last:
                shortcut_paths.append(self.directory / (key + SUFFIX_LAST))
            for spath in shortcut_paths:
                if spath.exists() or spath.is_symlink():
                    spath.unlink()
                if state["frozen"]:
                    spath.symlink_to(key + SUFFIX_FROZEN)
                elif is_checkpointed or is_stored:
                    spath.symlink_to(key + SUFFIX_EPOCH % epoch1)
                else:
                    save_state(state, spath)

        # training state, atomically
        if is_checkpointed or is_stored:
            training_path = self.directory / (FNAME_TRAINING % epoch1)
            tmp_path = self.directory / ((FNAME_TRAINING % epoch1) + ".tmp")
            save_state(training_state, tmp_path)
            tmp_path.rename(training_path)
            if is_checkpointed and self.checkpoint_every and epoch >= self.checkpoint_every:
                old = self.directory / (FNAME_TRAINING % (last_checkpoint + 1))
                if old.exists():
                    old.unlink()

        # GC previous epoch files; promote best
        for key, state in networks_state.items():
            best_path = self.directory / (key + SUFFIX_BEST_SO_FAR)
            if not best_path.exists():
                final_best = self.directory / (key + SUFFIX_BEST)
                if final_best.exists():
                    final_best.rename(best_path)
            if is_checkpointed and last_checkpoint >= 0 and not last_is_stored:
                previous = self.directory / (key + SUFFIX_EPOCH % (last_checkpoint + 1))
                if previous.exists():
                    if best_path.exists() and previous == best_path.resolve():
                        best_path.unlink()
                        previous.rename(best_path)
                    else:
                        previous.unlink()
            if is_last:
                if best_path.exists():
                    best_path.rename(self.directory / (key + SUFFIX_BEST))

    @staticmethod
    def _load_epoch_network(directory, suffix):
        network_state = {
            "net": load_checkpoint_any(Path(directory) / ("net" + suffix))
        }
        assert "net" not in network_state["net"].get("_networks_included", {})
        network_state.update(network_state["net"].pop("_networks_included", {}))
        for name in network_state["net"].pop("_network_names", []):
            assert name not in network_state
            network_state[name] = load_checkpoint_any(
                Path(directory) / (name + suffix))
        return network_state

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

        checkpoint = load_checkpoint_any(directory)
        assert "net" not in checkpoint.get("_networks_included", {})
        return {"net": checkpoint, **checkpoint.pop("_networks_included", {})}

    @classmethod
    def load_checkpoint_file(cls, path):
        """Single checkpoint file/URL -> raw checkpoint dict (the 'net' level)."""
        return cls.load_network(path)["net"]
