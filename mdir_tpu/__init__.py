"""mdir-tpu: TPU-native multi-domain image retrieval framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of jenicek/mdir
(see ARCHITECTURE.md and SURVEY.md).
"""
__version__ = "0.1.0"

import os as _os


def _setup_compilation_cache():
    """Persistent XLA compilation cache (huge win for remote-device compiles;
    harmless locally). Respects an explicit JAX_COMPILATION_CACHE_DIR."""
    if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
        # prefer a repo-local cache (shared across bench/eval invocations on
        # this checkout); fall back to the user cache dir
        repo_cache = _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)), "..", ".jax_cache")
        try:
            _os.makedirs(repo_cache, exist_ok=True)
            cache_dir = _os.path.abspath(repo_cache)
        except OSError:
            cache_dir = _os.path.join(
                _os.path.expanduser("~"), ".cache", "mdir_tpu", "jax_cache")
            _os.makedirs(cache_dir, exist_ok=True)
        _os.environ["JAX_COMPILATION_CACHE_DIR"] = cache_dir
    try:
        import jax

        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # some platform plugins pin jax_platforms, overriding the standard
        # JAX_PLATFORMS env var; restore the env var's authority
        env_platforms = _os.environ.get("JAX_PLATFORMS")
        if env_platforms:
            jax.config.update("jax_platforms", env_platforms)
    except Exception:
        pass


_setup_compilation_cache()

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
