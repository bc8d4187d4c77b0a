"""Functional training step: loss-of-params + optax update, jit-compiled.

The reference's "fakebatch" (per-image backward accumulating grads, one
optimizer step per batch — ``epoch_iteration.py:46-75``) is mathematically a
sum of per-tuple losses followed by one step; on TPU we compute the whole
batch in one compiled program (images padded into a static bucket with exact
valid-extent masking) — identical optimizer-step semantics, MXU-sized
batches. For large buckets (batch element count ≥
``MDIR_TPU_REMAT_MIN_ELEMENTS``, default 2^24) the model apply is wrapped in
``jax.checkpoint`` so activation memory stays bounded at mining-tuple sizes;
small batches keep the full-speed non-remat path. The threshold is read at
trace time from the static batch shape, so each compiled bucket picks its
own policy.

Supports SingleNetwork/CirNetwork (single param tree) and SequentialNetwork
(per-subnet trees, used with optimizer alternation).
"""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models import _accepts_train


def _remat_min_elements():
    # 2^24 input elements ~ 70 images at 384^2: below this, resnet101-scale
    # activations fit v5e HBM comfortably and full remat measurably hurts
    # (+85% step time at 35x384^2 measured); above, trade FLOPs for memory
    return int(os.environ.get("MDIR_TPU_REMAT_MIN_ELEMENTS", str(2 ** 24)))


def _merge_params(variables, params):
    return {**variables, "params": params}


def _cast_trunk(variables, dtype):
    """Cast only the ``features`` subtree (every collection) to ``dtype``.

    The head (lwhiten/pool/whiten) params stay f32: with the module's
    ``head_dtype="float32"`` seam this gives a bf16 conv trunk feeding an
    f32 pool/L2N/loss tail — the standard mixed-precision split. The full
    tree cast (measured gradient cosine 0.969 vs f32) fails the training
    guard; the trunk-only split keeps the loss-sensitive tail exact.
    """
    cast = lambda a: a.astype(dtype) \
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a
    out = {}
    for collection, tree in variables.items():
        if isinstance(tree, dict) and "features" in tree:
            tree = {**tree, "features": jax.tree.map(cast, tree["features"])}
        out[collection] = tree
    return out


def _apply_model(model, params, batch, valid_hw, train, rng,
                 compute_dtype=None, extra_vars=None):
    """Pure apply of one Model with substituted params; returns (out, new_bs).

    ``extra_vars`` are the non-param collections (batch_stats) passed as a
    TRACED input: reading ``model.variables`` inside the traced function
    would bake them in as compile-time constants, so evolving BN running
    stats from earlier steps would never be seen again (stale-stats bug).
    ``None`` falls back to the snapshot for stateless/frozen uses.

    ``compute_dtype`` runs the trunk in the MXU's fast dtype with f32 master
    params: the cast happens inside the differentiated function, so grads
    flow back to (and optimizer state stays in) float32, and only the
    ``features`` subtree is cast — the head runs f32 via ``head_dtype``.
    Only used for descriptor models (frozen BN, no train-mode mutations).
    """
    mutable = ["batch_stats"] if (train and "batch_stats" in model.variables) \
        else False
    module = model.module
    if compute_dtype is not None and hasattr(module, "head_dtype"):
        module = module.clone(head_dtype="float32")
    if extra_vars is None:
        extra_vars = {k: v for k, v in model.variables.items()
                      if k != "params"}

    def run(params, extra_vars, batch, valid_hw, rng):
        variables = _merge_params(extra_vars, params)
        if compute_dtype is not None:
            variables = _cast_trunk(variables, compute_dtype)
            batch = batch.astype(compute_dtype)
        rngs = {"dropout": rng} if rng is not None else None
        if _accepts_train(module):
            return module.apply(variables, batch, train=train,
                                rngs=rngs, mutable=mutable)
        return module.apply(variables, batch, valid_hw=valid_hw,
                            mutable=mutable)

    if batch.size >= _remat_min_elements():
        run = jax.checkpoint(run)
    out = run(params, extra_vars, batch, valid_hw, rng)
    if mutable:
        return out[0], out[1].get("batch_stats")
    return out, None


class TrainStep:
    """Jitted value-and-grad + optimizer apply for one network.

    With ``mesh`` set, the flattened image batch is sharded across the mesh's
    data axis and parameters are replicated; XLA inserts the gradient
    all-reduce over ICI (pick a batch size divisible by the device count —
    the tuple loaders use drop_last like the reference).

    ``param_sharding="zero"`` (yaml: ``network: runtime: param_sharding``)
    additionally constrains the returned gradients to ZeRO-style per-leaf
    shardings (``parallel/mesh.py::zero_shardings``): the step emits
    reduce-scattered gradients instead of all-reduced ones, and the paired
    ``Optimizer.shard_state(mesh)`` keeps momentum/Adam moments sharded N
    ways with the param all-gather inside the update program. Same total
    ICI bytes as plain DP, 1/N the gradient + optimizer-state memory.
    """

    def __init__(self, network, criterion, batch_average, mesh=None,
                 device_chain=None, compute_dtype="auto",
                 param_sharding="auto"):
        from ..ops.dtypes import guard_decision, resolve_compute_dtype

        self.network = network
        self.criterion = criterion
        self.batch_average = batch_average
        self.mean_reduction = criterion.reduction == "mean"
        self.mesh = mesh
        self.device_chain = device_chain
        self._grad_fn = None
        self._f32_grad_fn = None

        # fast compute dtype (f32 master params): descriptor models only —
        # train-mode models (dropout / live BN stats) stay f32 so mutated
        # collections keep full precision
        runtime = getattr(network, "network_params", None)
        runtime = dict(runtime.runtime) if runtime is not None else {}
        if compute_dtype != "auto":
            runtime["compute_dtype"] = compute_dtype
        if param_sharding == "auto":
            param_sharding = runtime.get("param_sharding")
        if param_sharding in ("dp", "none"):
            param_sharding = None
        assert param_sharding in (None, "zero"), param_sharding
        self.param_sharding = param_sharding
        dtype, guard = resolve_compute_dtype(runtime)
        model = getattr(network, "model", None)
        from .network import SequentialNetwork

        if dtype is not None and (model is None
                                  or isinstance(network, SequentialNetwork)
                                  or _accepts_train(model.module)
                                  or not hasattr(model.module, "head_dtype")):
            dtype, guard = None, False
        self._guard_pending = False
        self._guarded = dtype is not None and guard
        if self._guarded:
            decision = guard_decision(model.module, kind="train")
            if decision is False:
                dtype = None
            elif decision is None:
                self._guard_pending = True
        self.compute_dtype = dtype
        # periodic guard re-arm: the first-step check alone would miss a
        # run that drifts later (loss-landscape change, BN-stat motion),
        # so a guarded bf16 run re-runs the f32 cross-check every N steps
        # (~1% amortized cost at the default; 0 disables)
        self._steps = 0
        self._rearm_every = int(
            os.environ.get("MDIR_TPU_TRAIN_GUARD_REARM", "100")) \
            if self._guarded else 0

    def _build(self, compute_dtype=None):
        from .network import SequentialNetwork

        network = self.network
        criterion = self.criterion

        chain_fn = None
        chain_grid = None
        if self.device_chain is not None:
            from ..ops.preprocess import make_bucketed_chain

            chain_fn = make_bucketed_chain(self.device_chain)
            if self.device_chain.clahe_params is not None:
                chain_grid = self.device_chain.clahe_params[1]

        def preprocess(batch, valid_hw, clahe_aux):
            if chain_fn is None:
                return batch
            from ..models.trunks import apply_valid_mask

            if clahe_aux is not None:
                # aux ships as 2 packed arrays (one transfer each);
                # unpack in-graph with static bucket shapes
                from ..ops.clahe import unpack_clahe_aux

                clahe_aux = unpack_clahe_aux(
                    *clahe_aux, batch.shape[1:3], chain_grid)
            batch = chain_fn(batch, clahe_aux)
            if valid_hw is not None:
                batch = apply_valid_mask(batch, valid_hw)
            return batch

        if isinstance(network, SequentialNetwork):
            models = {name: network.networks[name].model
                      for name in network.sequence}
            sequence = list(network.sequence)
            trainable = {name: not network.networks[name].frozen
                         for name in sequence}

            def forward(params_by_net, batch, valid_hw, targets, rng,
                        clahe_aux, vars_by_net):
                aux = {}
                out = preprocess(batch, valid_hw, clahe_aux)
                for name in sequence:
                    model = models[name]
                    p = params_by_net.get(name, model.params)
                    out, new_bs = _apply_model(
                        model, p, out, None, trainable[name], rng,
                        extra_vars=vars_by_net.get(name))
                    if new_bs is not None:
                        aux[name] = new_bs
                if getattr(models[sequence[-1]], "is_descriptor_model", False):
                    out = out.T
                loss = criterion(out, targets)
                aux["_output"] = out
                return loss, aux
        else:
            model = network.model

            def forward(params, batch, valid_hw, targets, rng, clahe_aux,
                        net_vars):
                batch = preprocess(batch, valid_hw, clahe_aux)
                out, new_bs = _apply_model(model, params, batch, valid_hw,
                                           True, rng, compute_dtype,
                                           extra_vars=net_vars)
                out = out.astype(jnp.float32)  # loss/logging stay f32
                if getattr(model, "is_descriptor_model", False):
                    out = out.T  # criterion expects D x N columns
                loss = criterion(out, targets)
                aux = {"net": new_bs} if new_bs is not None else {}
                aux["_output"] = out
                return loss, aux

        mesh = self.mesh
        use_zero = self.param_sharding == "zero" and mesh is not None

        @jax.jit
        def value_and_grad(params, batch, valid_hw, targets, rng, clahe_aux,
                           net_vars):
            out, grads = jax.value_and_grad(forward, has_aux=True)(
                params, batch, valid_hw, targets, rng, clahe_aux, net_vars)
            if use_zero:
                # ZeRO-sharded DP: the gradients leave this program
                # reduce-scattered (one shard per device along each leaf's
                # largest divisible dim) instead of all-reduced; the paired
                # sharded optimizer update re-gathers params afterwards
                from ..parallel.mesh import zero_shardings

                grads = jax.lax.with_sharding_constraint(
                    grads, zero_shardings(mesh, grads))
            return out, grads

        return value_and_grad

    def _run_dtype_guard(self, fast_result, call_args):
        """First-step f32 cross-check of the fast training dtype: the bf16
        gradients must stay directionally identical (flattened cosine) and
        the loss within a relative tolerance, else this process's training
        for the module falls back to f32 (decision cached like the
        extraction guard's)."""
        from ..ops import dtypes as dtype_policy

        self._guard_pending = False
        if self._f32_grad_fn is None:
            self._f32_grad_fn = self._build(None)
        exact = self._f32_grad_fn(*call_args)
        (loss_f, _), grads_f = fast_result
        (loss_e, _), grads_e = exact
        flat_f = np.concatenate([np.asarray(g, np.float32).ravel()
                                 for g in jax.tree_util.tree_leaves(grads_f)])
        flat_e = np.concatenate([np.asarray(g, np.float32).ravel()
                                 for g in jax.tree_util.tree_leaves(grads_e)])
        loss_ok = abs(float(loss_f) - float(loss_e)) \
            <= 0.05 * max(abs(float(loss_e)), 1e-6)
        ok = loss_ok and np.isfinite(flat_f).all() \
            and dtype_policy.cosine_rows_ok(
                flat_f[None], flat_e[None],
                min_cosine=dtype_policy.train_guard_min_cosine())
        dtype_policy.record_guard_decision(self.network.model.module, ok,
                                           kind="train")
        if ok:
            return fast_result
        self.compute_dtype = None
        self._grad_fn = self._f32_grad_fn
        return exact

    def gradients(self, params, batch, valid_hw, targets, rng=None,
                  clahe_aux=None):
        if self._grad_fn is None:
            self._grad_fn = self._build(self.compute_dtype)
        if isinstance(clahe_aux, dict):
            from ..ops.clahe import pack_clahe_aux

            clahe_aux = pack_clahe_aux(clahe_aux)
        # live non-param collections ship through the jit boundary so BN
        # running stats written back after each step are actually READ by
        # the next step (a closure read would freeze the trace-time values)
        from .network import SequentialNetwork

        def _extras(model):
            return {k: v for k, v in model.variables.items()
                    if k != "params"}

        if isinstance(self.network, SequentialNetwork):
            net_vars = {name: _extras(self.network.networks[name].model)
                        for name in self.network.sequence}
        else:
            net_vars = _extras(self.network.model)
        if self.mesh is not None:
            from ..parallel.mesh import batch_sharding, replicated

            shard = batch_sharding(self.mesh)
            repl = replicated(self.mesh)
            assert batch.shape[0] % self.mesh.devices.size == 0, \
                "batch size %d not divisible by %d devices" % (
                    batch.shape[0], self.mesh.devices.size)
            params = jax.device_put(params, repl)
            net_vars = jax.device_put(net_vars, repl)
            batch = jax.device_put(np.asarray(batch), shard)
            if valid_hw is not None:
                valid_hw = jax.device_put(np.asarray(valid_hw), shard)
            targets = jax.device_put(np.asarray(targets), repl)
            if clahe_aux is not None:
                clahe_aux = tuple(jax.device_put(np.asarray(a), shard)
                                  for a in clahe_aux)
        call_args = (params, batch, valid_hw, targets, rng, clahe_aux,
                     net_vars)
        # re-arm the dtype guard every N steps: a mid-run drift must
        # trigger the same f32 fallback the first step would have
        self._steps += 1
        if self.compute_dtype is not None and self._rearm_every \
                and self._steps > 1 \
                and (self._steps - 1) % self._rearm_every == 0:
            self._guard_pending = True
        result = self._grad_fn(*call_args)
        if self._guard_pending:
            result = self._run_dtype_guard(result, call_args)
        return result


_EVAL_LOSS_CACHE = {}


def get_eval_loss_fn(network, criterion):
    """Jitted eval-mode loss over one flattened padded tuple batch, or None.

    Batched replacement for the wrapper path's per-image loop in loss
    validation (each per-image apply is a separate dispatch at batch 1):
    the tuple batch runs as ONE padded masked program — exactly equal to
    the per-image path by the bucketed-extraction invariant — when the
    network is a plain descriptor net whose eval wrappers only reshape
    (FakeBatch family). Cached per (module, criterion) so repeated frozen
    validation copies across epochs reuse the compiled program.
    """
    from .network import SequentialNetwork
    from .wrappers import FakeBatch

    model = getattr(network, "model", None)
    if model is None or isinstance(network, SequentialNetwork):
        return None
    compose = network.wrappers.get("eval")
    if compose is None or not all(isinstance(w, FakeBatch)
                                  for w in compose.wrappers):
        return None
    key = (id(model.module), id(criterion))
    if key not in _EVAL_LOSS_CACHE:
        # Capture only the weight-free module STRUCTURE (flax modules hold
        # no arrays) and the criterion — never the Model wrapper, whose
        # .variables tree would otherwise stay pinned in this cache for the
        # life of the process. All array state arrives as traced arguments.
        module = model.module
        is_descriptor = bool(getattr(model, "is_descriptor_model", False))

        def loss_fn(params, net_vars, batch, valid_hw, targets):
            variables = _merge_params(net_vars, params)
            if _accepts_train(module):
                out = module.apply(variables, batch, train=False)
            else:
                out = module.apply(variables, batch, valid_hw=valid_hw)
            out = out.astype(jnp.float32)
            if is_descriptor:
                out = out.T  # criterion expects D x N columns
            return criterion(out, targets)

        _EVAL_LOSS_CACHE[key] = jax.jit(loss_fn)
        # evict when either keyed object dies: a recycled id must never
        # inherit a program compiled for a different module structure or
        # criterion (same hazard class as dtypes._GUARD_DECISIONS), and the
        # cache must not grow unboundedly across long multi-network runs
        import weakref

        for obj in (module, criterion):
            try:
                weakref.finalize(obj, _EVAL_LOSS_CACHE.pop, key, None)
            except TypeError:
                pass  # un-weakref-able: entry persists for the run
    return _EVAL_LOSS_CACHE[key]


def pad_image_batch(images, multiple=32):
    """Pad a list of HWC arrays into one (N, H, W, C) bucket + valid_hw."""
    max_h = max(img.shape[0] for img in images)
    max_w = max(img.shape[1] for img in images)
    round_up = lambda v: -(-v // multiple) * multiple
    bh, bw = round_up(max_h), round_up(max_w)
    channels = images[0].shape[-1]
    dtype = np.uint8 if images[0].dtype == np.uint8 else np.float32
    batch = np.zeros((len(images), bh, bw, channels), dtype)
    valid = np.zeros((len(images), 2), np.int32)
    for i, img in enumerate(images):
        batch[i, :img.shape[0], :img.shape[1]] = img
        valid[i] = img.shape[:2]
    return batch, valid


def prepare_batch(batch_images, batch_targets, bucket_multiple=32):
    """Normalize a loader batch into (batch, valid_hw, targets, n_items).

    Tuple batches (list of image lists) flatten into one padded bucket;
    arrays pass through; image-pair targets pad alongside.
    """
    if isinstance(batch_images, list) and batch_images \
            and isinstance(batch_images[0], list):
        flat = [np.asarray(img) for tpl in batch_images for img in tpl]
        batch, valid = pad_image_batch(flat, bucket_multiple)
        targets = np.concatenate(
            [np.asarray(t).reshape(-1) for t in batch_targets])
        return batch, valid, targets, len(batch_images)

    if isinstance(batch_images, list):
        flat = [np.asarray(img) for img in batch_images]
        shapes = {img.shape for img in flat}
        if len(shapes) == 1:
            batch = np.stack(flat)
            valid = None
        else:
            batch, valid = pad_image_batch(flat, bucket_multiple)
        if isinstance(batch_targets, list) and batch_targets \
                and hasattr(batch_targets[0], "shape") \
                and np.asarray(batch_targets[0]).ndim >= 3:
            tgt = np.stack([np.asarray(t) for t in batch_targets]) \
                if len({np.asarray(t).shape for t in batch_targets}) == 1 \
                else pad_image_batch(
                    [np.asarray(t) for t in batch_targets], bucket_multiple)[0]
        else:
            tgt = np.concatenate(
                [np.asarray(t).reshape(-1) for t in batch_targets]) \
                if isinstance(batch_targets, list) else np.asarray(batch_targets)
        return batch, valid, tgt, len(flat)

    batch = np.asarray(batch_images)
    return batch, None, np.asarray(batch_targets), batch.shape[0]
