from .overlay import dict_deep_overlay, load_scenario

__all__ = ["dict_deep_overlay", "load_scenario"]
