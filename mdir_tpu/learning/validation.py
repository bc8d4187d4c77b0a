"""Validation tasks run between training epochs (or standalone in eval).

Same yaml surface as ``mdir/learning/validation.py`` — registry types
``SingleValidation`` / ``MultiCriterialValidation``, ``data: null`` meaning
"score criterion instead of a loss loader", ``network_overlay`` wrapper
swaps, per-epoch ``frequency`` gating — but decomposed differently: the two
modes of the reference's SingleValidation are separate classes here
(``ScoreValidation`` wraps a loader-less score such as CirDatasetAp,
``LossValidation`` averages a criterion over a loader) sharing a small
scheduling base, and ``SingleValidation`` is only the yaml-facing factory
that picks between them.
"""
import copy

import jax
import numpy as np

from ..data.datasets import initialize_dataset_loader
from ..optim.criteria import initialize_criterion
from ..optim.scores import initialize_score
from ..tools.stats import StopWatch
from ..tools.utils import get_dataset_params, indent


class NoValidation:

    decisive_criterion = ""

    def validations(self, _epoch):
        return []

    def __repr__(self):
        return "%s ()" % self.__class__.__name__


class _ScheduledValidation:
    """Shared scheduling: frequency gating + wrapper-overlay application."""

    def __init__(self, network_overlay, frequency):
        self.network_overlay = network_overlay
        self.frequency = frequency

    def should_validate(self, epoch):
        if epoch is None:
            return True
        return bool(self.frequency) and (epoch + 1) % self.frequency == 0

    def validations(self, epoch):
        return [("val", self)] if self.should_validate(epoch) else []

    def _frozen_overlay(self, network, device):
        overlay = copy.deepcopy(self.network_overlay)
        frozen = network.overlay_params(overlay, device)
        frozen.eval()
        return frozen


class ScoreValidation(_ScheduledValidation):
    """Loader-less validation: a score callable taking (network, device, logger)."""

    decisive_criterion = "val/learning/score:total"

    def __init__(self, score, network_overlay, frequency):
        super().__init__(network_overlay, frequency)
        self.criterion = score

    def validate(self, network, device=None, logger=None):
        network = self._frozen_overlay(network, device)
        return self.criterion(network, device, logger)

    def __repr__(self):
        return "%s (\n    score: %s\n    frequency: %s\n)" % (
            self.__class__.__name__, indent(str(self.criterion)), self.frequency)


class LossValidation(_ScheduledValidation):
    """Criterion averaged over a validation loader, reported batch-normalized."""

    decisive_criterion = "val/learning/loss:total"

    def __init__(self, data_loader, criterion, network_overlay, frequency):
        super().__init__(network_overlay, frequency)
        self.data_loader = data_loader
        self.criterion = criterion
        # criteria are pure jnp functions; un-jitted they dispatch each op
        # individually per validation batch (costly on remote backends)
        self._criterion_jit = jax.jit(criterion.__call__)
        assert criterion.reduction in {"mean", "sum"}, criterion.reduction

    def _batch_loss(self, network, images, targets):
        # tuple batches over a plain descriptor net run as ONE padded
        # masked program instead of a per-image wrapper loop (equal by the
        # bucketed-extraction invariant); everything else falls through to
        # the wrapper path
        if isinstance(images, list) and images \
                and isinstance(images[0], list):
            from .train_step import get_eval_loss_fn, prepare_batch

            fn = get_eval_loss_fn(network, self.criterion)
            if fn is not None:
                batch, valid, tgt, _ = prepare_batch(images, targets)
                net_vars = {k: v for k, v in
                            network.model.variables.items()
                            if k != "params"}
                loss = float(np.asarray(fn(network.model.params, net_vars,
                                           batch, valid, tgt)))
                if self.criterion.reduction == "sum":
                    loss /= len(images)
                return loss
        if isinstance(targets, list):
            targets = np.concatenate(
                [np.asarray(t).reshape(-1) for t in targets])
        else:
            targets = np.asarray(targets)
        loss = float(np.asarray(self._criterion_jit(network(images),
                                                    targets)))
        if self.criterion.reduction == "sum":
            loss /= len(images)
        return loss

    def _prepare(self, network, device, logger, watch):
        dataset = self.data_loader.dataset
        if not hasattr(dataset, "prepare_epoch"):
            return
        mining_stats = dataset.prepare_epoch(network, device)
        watch.lap("prepare_data")
        if logger:
            if mining_stats:
                logger(None, len(self.data_loader), "data_mining",
                       mining_stats, "scalar/loss")
            logger(None, len(self.data_loader), "prepare_epoch",
                   watch.reset(include_total=False), "scalar/time")

    def validate(self, network, device=None, logger=None):
        network = self._frozen_overlay(network, device)
        watch = StopWatch()
        self._prepare(network, device, logger, watch)

        losses = []
        total = len(self.data_loader)
        for i, (images, targets) in enumerate(self.data_loader):
            watch.lap("prepare_data")
            loss = self._batch_loss(network, images, targets)
            watch.lap("process_batch")
            if logger:
                logger(i, total, "loss", {"total": loss}, "scalar/loss")
                logger(i, total, "iteration",
                       watch.reset(include_total=False), "scalar/time")
            losses.append(loss)
        return losses

    def __repr__(self):
        return "%s (\n    criterion: %s\n    frequency: %s\n)" % (
            self.__class__.__name__, indent(str(self.criterion)), self.frequency)


class SingleValidation:
    """Yaml-facing factory: picks Score- or LossValidation from the params."""

    @classmethod
    def initialize(cls, params, data, params_data, default_criterion,
                   net_defaults):
        data_key = params.pop("data")
        criterion_section = params.pop("criterion")
        schedule = {"network_overlay": params.pop("network_overlay"),
                    "frequency": params.pop("frequency")}
        assert not params, params.keys()

        if criterion_section == "default" and default_criterion is None:
            raise ValueError(
                "Criterion cannot be 'default' when default criterion is not specified")

        if data_key is None:
            if criterion_section == "default":
                score = default_criterion
            else:
                score = initialize_score(
                    get_dataset_params(criterion_section, net_defaults))
            return ScoreValidation(score, **schedule)

        loader_params = get_dataset_params(params_data[data_key], net_defaults)
        loader = initialize_dataset_loader(data, "val",
                                           copy.deepcopy(loader_params))
        if criterion_section == "default":
            criterion = default_criterion
        else:
            criterion = initialize_criterion(criterion_section)
        return LossValidation(loader, criterion, **schedule)


class MultiCriterialValidation:

    def __init__(self, decisive_criterion, validations):
        self.decisive_criterion = decisive_criterion
        self.vals = validations

    @classmethod
    def initialize(cls, params, **kwargs):
        decisive_criterion = params.pop("decisive_criterion")
        named = {key: initialize_validation(scenario, **kwargs)
                 for key, scenario in params.items()}
        return cls(decisive_criterion, named)

    def validations(self, epoch):
        return [(key, val) for key, val in self.vals.items()
                if val.should_validate(epoch)]

    def __repr__(self):
        inner = "".join("%s: %s\n" % (x, y) for x, y in self.vals.items())
        return "%s (\n  decisive_criterion: %s\n%s)" % (
            self.__class__.__name__, self.decisive_criterion, indent(inner))


VALIDATIONS = {
    "SingleValidation": SingleValidation,
    "MultiCriterialValidation": MultiCriterialValidation,
}


def initialize_validation(params, **kwargs):
    if isinstance(params, bool) and not params:
        return NoValidation()
    return VALIDATIONS[params.pop("type")].initialize(params, **kwargs)
