"""The training hot loop (SupervisedEpoch).

Parity with ``mdir/learning/epoch_iteration.py``: eval-mode ``prepare_epoch``
(hard-negative mining) before each epoch, per-batch optimization steps with
fakebatch/batch_average loss-scaling semantics, loss/time logging per
iteration, weight histograms at epoch edges, and input/output/target image
samples every LOG_TRAINDATA_SAMPLE_EVERY epochs.

On TPU the fakebatch path and the regular path are one compiled program each
(see train_step.py); their reported losses follow the reference's scaling
rules exactly.
"""
import copy

import jax
import numpy as np

from ..data.datasets import initialize_dataset_loader
from ..optim.criteria import initialize_criterion
from ..tools.stats import StopWatch
from ..tools.utils import get_dataset_params, indent
from .train_step import TrainStep, prepare_batch


@jax.jit
def _div_tree(tree, scalar):
    return jax.tree.map(lambda g: g / scalar, tree)


@jax.jit
def _mul_tree(tree, scalar):
    return jax.tree.map(lambda g: g * scalar, tree)


class SupervisedEpoch:

    LOG_TRAINDATA_SAMPLE_EVERY = 5

    def __init__(self, data_loader, criterion, mean_std, *, batch_average,
                 fakebatch, parallel=None):
        self.data_loader = data_loader
        self.criterion = criterion
        self.mean_std = mean_std
        self.epoch = None
        # a None batch_average would TypeError mid-epoch at the grad-scale
        # comparison (the reference crashes identically at its
        # epoch_iteration.py:61) — reject it at construction instead
        assert isinstance(batch_average, bool), \
            "batch_average must be a bool, got %r" % (batch_average,)
        self.batch_average = batch_average
        self.fakebatch = fakebatch
        # our extension over the reference schema: {"data": n} shards train
        # batches over an n-device mesh (omit for single chip)
        self.parallel = parallel

        assert criterion.reduction in {"mean", "sum"}, criterion.reduction
        self.criterion_mean_reduction = criterion.reduction == "mean"
        self._train_step = None
        self._rng = jax.random.PRNGKey(0)

    @classmethod
    def initialize(cls, params_epoch, data, params_data, default_criterion,
                   net_defaults):
        data_key = params_epoch.pop("data")
        data_params = get_dataset_params(params_data[data_key], net_defaults)
        data_loader = initialize_dataset_loader(
            data, "train", copy.deepcopy(data_params), {"shuffle": True})
        cls._enable_device_preprocess(data_loader)

        criterion_section = params_epoch.pop("criterion")
        if criterion_section == "default":
            if default_criterion is None:
                raise ValueError(
                    "Criterion cannot be 'default' when default criterion is not specified")
            criterion = default_criterion
        else:
            criterion = initialize_criterion(criterion_section)

        return cls(data_loader=data_loader, criterion=criterion,
                   mean_std=data_params["mean_std"], **params_epoch)

    @staticmethod
    def _enable_device_preprocess(data_loader):
        """Run a supported photometric train chain (CLAHE etc.) on device.

        When the tuple dataset's host transform lowers to a DeviceChain, the
        training items ship as raw uint8 (4x less ingress, zero per-item host
        CPU on this 1-core host — the reference instead spends 6 DataLoader
        workers on it) and the chain fuses into the train-step program.
        Mining extraction keeps ``dataset.transform`` and fuses independently
        (parallel/extract.py). Label-target tuple datasets only: image
        targets would need the chain too.
        """
        import os

        from ..data.datasets import TuplesDataset

        if os.environ.get("MDIR_TPU_DEVICE_PREPROCESS", "1") == "0":
            return
        dataset = data_loader.dataset
        if not isinstance(dataset, TuplesDataset):
            return
        from ..ops.preprocess import RawChainInput, chain_from_transform

        chain = chain_from_transform(dataset.transform)
        if chain is None:
            return
        dataset.item_transform = RawChainInput(chain)
        dataset.device_chain = chain

    def steps(self, epoch):
        self.epoch = epoch
        return self

    def _optimization_step(self, network, optimizer, device, batch_images,
                           batch_targets):
        from .network import SequentialNetwork

        if self._train_step is None:
            mesh = None
            if self.parallel and self.parallel.get("data", 0) > 1:
                from ..parallel.mesh import make_mesh

                mesh = make_mesh(self.parallel["data"])
            self._train_step = TrainStep(
                network, self.criterion, self.batch_average, mesh=mesh,
                device_chain=getattr(self.data_loader.dataset,
                                     "device_chain", None))
            if mesh is not None \
                    and self._train_step.param_sharding == "zero" \
                    and hasattr(optimizer, "shard_state"):
                # pair the reduce-scattered gradients with ZeRO-sharded
                # optimizer state (one-time re-jit of the update program)
                optimizer.shard_state(mesh)

        from ..parallel.device_cache import CachedImageRef

        flat_refs = isinstance(batch_images, list) and batch_images \
            and isinstance(batch_images[0], list) \
            and any(isinstance(img, CachedImageRef)
                    for tpl in batch_images for img in tpl)
        if flat_refs:
            # mining->train handoff: tuple images mining just shipped stack
            # from HBM (bit-identical to the host-padded bucket, pinned by
            # tests/test_device_cache.py); only cache misses ride the wire
            cache = self.data_loader.dataset.device_cache
            flat = [img for tpl in batch_images for img in tpl]
            batch, valid, _ = cache.assemble_train_batch(flat)
            targets = np.concatenate(
                [np.asarray(t).reshape(-1) for t in batch_targets])
            batch_size = len(batch_images)
        else:
            batch, valid, targets, batch_size = prepare_batch(batch_images,
                                                              batch_targets)
        clahe_aux = None
        chain = self._train_step.device_chain
        if chain is not None and chain.clahe_params is not None:
            from ..ops.clahe import clahe_bucket_aux

            clip, grid = chain.clahe_params
            shapes = [tuple(int(x) for x in v) for v in valid] \
                if valid is not None else [batch.shape[1:3]] * batch.shape[0]
            clahe_aux = clahe_bucket_aux(shapes, batch.shape[1:3],
                                         clip_limit=clip, grid=grid)
        self._rng, rng = jax.random.split(self._rng)

        if isinstance(network, SequentialNetwork):
            params = {name: network.networks[name].model.params
                      for name in network.sequence
                      if not network.networks[name].frozen}
        else:
            params = network.model.params

        (loss, aux), grads = self._train_step.gradients(
            params, batch, valid, targets, rng, clahe_aux=clahe_aux)
        output = aux.pop("_output", None)

        # batch_average vs criterion-reduction reconciliation (the tree
        # scale is one jitted program — an un-jitted tree_map is hundreds
        # of per-leaf dispatches per step on a remote-device backend)
        divide_loss = multiply_loss = False
        if self.batch_average > self.criterion_mean_reduction:
            divide_loss = True
            grads = _div_tree(grads, np.float32(batch_size))
        elif self.batch_average < self.criterion_mean_reduction:
            multiply_loss = True
            grads = _mul_tree(grads, np.float32(batch_size))

        # optimizer step + write back new params / batch stats
        if isinstance(network, SequentialNetwork):
            new_params = optimizer.apply(params, grads)
            for name, p in new_params.items():
                network.networks[name].model.replace_params(p)
            for name, bs in aux.items():
                model = network.networks[name].model
                model.variables = {**model.variables, "batch_stats": bs}
        else:
            new_params = optimizer.apply(params, grads)
            network.model.replace_params(new_params)
            if aux.get("net") is not None:
                network.model.variables = {**network.model.variables,
                                           "batch_stats": aux["net"]}

        # report batch-averaged like the reference. The loss stays a device
        # scalar inside a deferred closure: the caller reads it one step
        # late, so the next batch's host->device transfer overlaps this
        # step's device compute instead of blocking on a host read here
        # (the exact float arithmetic of the eager version is preserved)
        batch_avg_off = not self.batch_average  # bool (asserted in __init__)

        def loss_value(loss_dev=loss):
            value = float(np.asarray(loss_dev))
            if divide_loss:
                value /= batch_size
            elif multiply_loss:
                value *= batch_size
            if batch_avg_off:
                value /= batch_size
            return {"total": value}

        # output stays a lazy device array; it is sliced/transferred only on
        # the (rare) sample-logging iterations
        last_image = batch_images[-1]
        if isinstance(last_image, list):
            output = None
        return loss_value, last_image, output, batch_targets[-1]

    def _log_parameter_weights(self, network, logger):
        for train_data in network.train_data():
            logger(train_data["key"], train_data["data"], train_data["dtype"])

    def _materialize_ref(self, img):
        """Cache-resident sample -> raw pixels (sample-logging iterations
        only; the entry IS the padded raw payload, cropped to its extent)."""
        from ..parallel.device_cache import CachedImageRef

        if isinstance(img, CachedImageRef):
            cache = self.data_loader.dataset.device_cache
            return np.asarray(cache.peek(img.key))[:img.hw[0], :img.hw[1]]
        return img

    def _log_traindata_sample(self, image, logger, label):
        if not isinstance(image, list):
            image = [image]
        image = [self._materialize_ref(img) for img in image]
        dbg = {}
        for j, img in enumerate(image):
            img = np.asarray(img)
            if img.ndim == 4:
                img = img[0]
            nchans = img.shape[-1]
            if img.dtype == np.uint8:
                # raw device-chain ingress: already displayable
                img = img.astype(np.float32) / 255.0
                mean = np.zeros(nchans, np.float32)
                std = np.ones(nchans, np.float32)
            else:
                mean = np.asarray(self.mean_std[0], np.float32)
                std = np.asarray(self.mean_std[1], np.float32)
            if nchans >= 3:
                dbg["image%s.rgb" % j] = {
                    "dtype": "image:rgb",
                    "data": img[..., :3] * std[:3] + mean[:3]}
                if j >= 3:
                    continue
            for k in range(3 if nchans >= 3 else 0, nchans):
                dbg["image%s.chan%s" % (j, k + 1)] = {
                    "dtype": "image:gray",
                    "data": img[..., k] * std[k] + mean[k]}
                if j >= 3:
                    break
        logger("data/%s" % label, dbg, "blob")

    def _mine_epoch_tuples(self, network, device, logger, watch):
        """Eval-mode prepare_epoch hook (hard-negative mining) + stats."""
        dataset = self.data_loader.dataset
        if not hasattr(dataset, "prepare_epoch"):
            return
        network.eval()
        mining_stats = dataset.prepare_epoch(network, device)
        watch.lap("prepare_data")
        total = len(self.data_loader)
        if mining_stats:
            logger(None, total, "learning/data_mining", mining_stats,
                   "scalar/loss")
        logger(None, total, "learning/prepare_epoch",
               watch.reset(include_total=False), "scalar/time")

    def iterate(self, network, optimizer, device, logger):
        train_loader = self.data_loader
        stopwatch = StopWatch()

        network.eval()
        self._mine_epoch_tuples(network, device, logger, stopwatch)

        if self.epoch == 0:
            self._log_parameter_weights(
                network, logger=lambda *x: logger(-1, len(train_loader), *x))

        network.train()

        pending_loss = None  # (iteration, deferred closure): 1-step lag
        for i, (batch_images, batch_targets) in enumerate(train_loader):
            stopwatch.lap("prepare_data")
            step_data = self._optimization_step(network, optimizer, device,
                                                batch_images, batch_targets)
            stopwatch.lap("process_batch")
            # read the PREVIOUS step's loss now that this step is enqueued:
            # the host sync then overlaps this step's transfer/compute
            if pending_loss is not None:
                logger(pending_loss[0], len(train_loader), "learning/loss",
                       pending_loss[1](), "scalar/loss")
            pending_loss = (i, step_data[0])
            if i == len(train_loader) - 1:
                logger(i, len(train_loader), "learning/loss",
                       pending_loss[1](), "scalar/loss")
                pending_loss = None

            if i == len(train_loader) - 1:
                self._log_parameter_weights(
                    network, logger=lambda *x: logger(i, len(train_loader), *x))
            if (i == len(train_loader) - 1
                    and (self.epoch + 1) % self.LOG_TRAINDATA_SAMPLE_EVERY == 0) \
                    or (i == 0 and self.epoch == 0):
                _losses, image, output, target = step_data
                loggeri = lambda *x: logger(i, len(train_loader), *x)
                self._log_traindata_sample(image, loggeri, "input")
                # image-to-image nets only: a descriptor output has fewer
                # dims than its input and is skipped, like the reference
                # (mdir/learning/epoch_iteration.py:153-155)
                if not isinstance(image, list) and output is not None \
                        and output.ndim == np.asarray(image).ndim + 1:
                    self._log_traindata_sample(np.asarray(output)[-1],
                                               loggeri, "output")
                    self._log_traindata_sample(target, loggeri, "target")

            yield step_data

            stopwatch.lap("take_statistics")
            logger(i, len(train_loader), "learning/iteration",
                   stopwatch.reset(include_total=False), "scalar/time")

    def __repr__(self):
        return ("%s (\n    criterion: %s\n    fakebatch: %s\n"
                "    batch_average: %s\n)" % (
                    self.__class__.__name__, indent(str(self.criterion)),
                    self.fakebatch, self.batch_average))


EPOCH_ITERATIONS = {
    "SupervisedEpoch": SupervisedEpoch,
}


def initialize_epoch_iteration(params, **kwargs):
    return EPOCH_ITERATIONS[params.pop("type")].initialize(params, **kwargs)
