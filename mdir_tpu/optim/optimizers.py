"""Optimizers on optax with torch-semantics param groups.

Parity with the reference optimizer layer: sgd/adam factories
(``base_optimizers.py``; torch-style coupled weight decay: wd*p added to the
gradient), per-group options via the network's label tree (CirNetwork's pool
p gets 10x lr and 0 weight decay — reference ``network.py:410-428``), and the
``OptimizerAlternation`` composition (per-subnet optimizers, alternate every
N steps or all-at-once, ``None`` freezes the subnet).

Learning rates live in inject_hyperparams state so the epoch schedulers can
set them imperatively, matching the reference's torch scheduler.step() flow.
"""
import jax
import jax.numpy as jnp
import optax


def _sgd_core(momentum):
    return optax.trace(decay=momentum, nesterov=False)


def _adam_core():
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


def _make_group_tx(algorithm, lr, weight_decay, momentum=None):
    """One param group transform; lr is an injectable hyperparam."""
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    if algorithm == "sgd":
        if momentum:
            chain.append(_sgd_core(momentum))
    elif algorithm == "adam":
        chain.append(_adam_core())
    else:
        raise KeyError(algorithm)

    def tx(learning_rate):
        return optax.chain(*chain, optax.scale_by_learning_rate(learning_rate))

    return optax.inject_hyperparams(tx)(learning_rate=lr)


class Optimizer:
    """optax optimizer over a single network's params with labeled groups."""

    def __init__(self, tx, params, base_lrs, group_names):
        self.tx = tx
        self.state = tx.init(params)
        self.base_lrs = base_lrs  # {group: base lr}
        self.group_names = group_names
        self._zero_mesh = None  # set by shard_state (ZeRO-sharded DP mode)
        # one compiled program per step: an un-jitted optax update is
        # thousands of individual dispatches over the param tree, which on
        # a remote-device backend costs more than the gradient computation
        # itself (hyperparams like lr are state arrays, so no retrace when
        # the scheduler changes them)
        self._update = jax.jit(self._update_fn)

    def _update_fn(self, grads, state, params):
        updates, new_state = self.tx.update(grads, state, params)
        return optax.apply_updates(params, updates), new_state

    @classmethod
    def create(cls, net_parameters, algorithm, lr, weight_decay, momentum=None):
        """net_parameters: {"params", "labels", "opts"} from Network.parameters."""
        params = net_parameters["params"]
        labels = net_parameters["labels"]
        opts = net_parameters["opts"]

        group_names = sorted({*jax.tree.leaves(labels), "default"})
        transforms = {}
        base_lrs = {}
        for group in group_names:
            gopts = opts.get(group, {})
            glr = lr * gopts.get("lr_multiplier", 1.0)
            gwd = gopts.get("weight_decay", weight_decay)
            transforms[group] = _make_group_tx(algorithm, glr, gwd, momentum)
            base_lrs[group] = glr
        tx = optax.multi_transform(transforms, labels)
        return cls(tx, params, base_lrs, group_names)

    def apply(self, params, grads):
        new_params, self.state = self._update(grads, self.state, params)
        return new_params

    def shard_state(self, mesh):
        """ZeRO-style optimizer-state sharding over the mesh's data axis.

        Momentum/Adam moments live sharded N ways; the jitted update
        consumes reduce-scattered gradients (TrainStep's
        ``param_sharding: zero`` output constraint) and emits REPLICATED
        new params — the all-gather rides inside the compiled update
        program, so every downstream consumer (extraction, validation,
        checkpointing) sees ordinary replicated parameters. Reduce-scatter
        + all-gather totals the same ICI bytes as the plain DP all-reduce
        while cutting gradient + optimizer-state memory to 1/N per device.
        """
        from ..parallel.mesh import replicated, zero_put, zero_shardings

        self._zero_mesh = mesh
        self.state = zero_put(mesh, self.state)
        self._update = jax.jit(
            self._update_fn,
            out_shardings=(replicated(mesh), zero_shardings(mesh, self.state)))

    def zero_grad(self):
        pass  # functional gradients; kept for API parity

    def set_lr_factor(self, factor):
        """Scale every group's lr to base * factor (scheduler hook)."""
        for group, sub in self.state.inner_states.items():
            sub.inner_state.hyperparams["learning_rate"] = jnp.asarray(
                self.base_lrs[group] * factor)

    @property
    def learning_rates(self):
        return {group: float(sub.inner_state.hyperparams["learning_rate"])
                for group, sub in self.state.inner_states.items()}

    def state_dict(self):
        import numpy as np

        flat = jax.tree.map(lambda x: np.asarray(x), self.state)
        return {"optax_state": jax.tree.flatten(flat)[0],
                "base_lrs": dict(self.base_lrs)}

    def load_state_dict(self, state_dict):
        leaves, treedef = jax.tree.flatten(self.state)
        new_leaves = state_dict["optax_state"]
        assert len(new_leaves) == len(leaves), (len(new_leaves), len(leaves))
        restored = [jnp.asarray(n) if hasattr(l, "shape") else type(l)(n)
                    for n, l in zip(new_leaves, leaves)]
        self.state = jax.tree.unflatten(treedef, restored)
        if self._zero_mesh is not None:  # restore the ZeRO placement
            from ..parallel.mesh import zero_put

            self.state = zero_put(self._zero_mesh, self.state)


def init_sgd(net_parameters, lr, momentum, weight_decay):
    return Optimizer.create(net_parameters, "sgd", lr, weight_decay, momentum)


def init_adam(net_parameters, lr, weight_decay):
    return Optimizer.create(net_parameters, "adam", lr, weight_decay)


BASE_OPTIMIZERS = {
    "sgd": init_sgd,
    "adam": init_adam,
}


def initialize_base_optimizer(net_parameters, params):
    params = dict(params)
    algorithm = params.pop("algorithm")
    return BASE_OPTIMIZERS[algorithm](net_parameters, **params)


class OptimizerAlternation:
    """Per-subnet optimizers with optional step alternation (GAN-style)."""

    def __init__(self, optimizers, alternate_iteration, order):
        if len(optimizers) == 1:
            assert alternate_iteration is None
            self.names = list(optimizers.keys())
            self.optimizers = list(optimizers.values())
        else:
            assert alternate_iteration is not None
            order = order.split(",")
            assert optimizers.keys() == set(order)
            self.names = order
            self.optimizers = [optimizers[x] for x in order]
        self.alternate_iteration = alternate_iteration
        self.current_iteration = 0
        self.current_optimizer = 0

    def __iter__(self):
        return iter(self.names)

    def __getitem__(self, key):
        return self.optimizers[self.names.index(key)]

    def zero_grad(self):
        pass

    def active_names(self):
        """Subnets whose optimizer steps at the next apply call."""
        if self.alternate_iteration:
            return [self.names[self.current_optimizer]]
        return list(self.names)

    def apply(self, params_by_net, grads_by_net):
        """Step the active optimizer(s); returns updated params per subnet."""
        self.current_iteration += 1
        new_params = dict(params_by_net)
        if self.alternate_iteration:
            name = self.names[self.current_optimizer]
            opt = self.optimizers[self.current_optimizer]
            new_params[name] = opt.apply(params_by_net[name], grads_by_net[name])
            if self.current_iteration % self.alternate_iteration == 0:
                self.current_optimizer = (self.current_optimizer + 1) % len(self.optimizers)
        else:
            for name, opt in zip(self.names, self.optimizers):
                new_params[name] = opt.apply(params_by_net[name], grads_by_net[name])
        return new_params

    def set_lr_factor(self, factor):
        for opt in self.optimizers:
            opt.set_lr_factor(factor)

    def shard_state(self, mesh):
        for opt in self.optimizers:
            opt.shard_state(mesh)

    def state_dict(self):
        dct = {name: opt.state_dict()
               for name, opt in zip(self.names, self.optimizers)}
        dct["alternation"] = {"iteration": self.current_iteration,
                              "optimizer": self.current_optimizer}
        return dct

    def load_state_dict(self, state_dict):
        alternation = state_dict.pop("alternation")
        self.current_iteration = alternation["iteration"]
        self.current_optimizer = alternation["optimizer"]
        assert state_dict.keys() == set(self.names)
        for name, opt in zip(self.names, self.optimizers):
            opt.load_state_dict(state_dict[name])


OPTIMIZER_COMPOSITIONS = {
    "alternation": OptimizerAlternation,
}


def initialize_optimizer_composition(network, params):
    composition = params.pop("composition")
    comp_cls = OPTIMIZER_COMPOSITIONS[composition.pop("type")]
    acc = {}
    for net in list(params.keys()):
        if params[net] is not None:
            acc[net] = initialize_base_optimizer(
                network.parameters(params[net], net), params[net])
        else:
            network.freeze(net)
    return comp_cls(acc, **composition)


def initialize_optimizer(network, params):
    if not params:
        return None
    params = dict(params)
    if "composition" in params:
        return initialize_optimizer_composition(network=network, params=params)
    return initialize_base_optimizer(network.parameters(params), params)
