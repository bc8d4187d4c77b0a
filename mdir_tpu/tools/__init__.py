from . import stats, utils

__all__ = ["stats", "utils", "events", "imgtools", "plots"]


def __getattr__(name):
    if name in ("events", "imgtools", "plots"):
        import importlib

        module = importlib.import_module("." + name, __name__)
        globals()[name] = module
        return module
    raise AttributeError(name)
