"""mdir-tpu: TPU-native multi-domain image retrieval framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of jenicek/mdir
(see ARCHITECTURE.md and SURVEY.md).
"""
__version__ = "0.1.0"

from . import config, tools

__all__ = ["config", "tools", "stages"]


def __getattr__(name):
    # heavy subpackages (jax/flax imports) load lazily
    if name in ("stages", "models", "data", "learning", "optim", "ops", "parallel"):
        import importlib

        module = importlib.import_module("." + name, __name__)
        globals()[name] = module
        return module
    raise AttributeError(name)
