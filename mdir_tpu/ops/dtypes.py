"""Compute-dtype policy: bfloat16 on the MXU by default, runtime-guarded.

The v5e MXU's native multiply dtype is bfloat16 — f32 convs run at half
throughput. Descriptor extraction and training compute default to bf16 on
accelerator backends, but the claim "bf16 descriptors are
retrieval-identical" is guarded *at runtime* rather than assumed: the first
chunk of every process runs in both dtypes and the bf16 result must stay
within a cosine tolerance of f32, else the run falls back to f32 (the same
pattern the device-L plane uses). Tests force CPU where the policy resolves
to f32, keeping every parity pin exact.

Selection surface (first match wins):
* ``MDIR_TPU_COMPUTE_DTYPE`` env var — forced, no guard (power users/bench);
* the network runtime section's ``compute_dtype`` key (yaml-reachable:
  ``network: runtime: compute_dtype: bfloat16|float32|auto``);
* ``auto`` — bf16 + first-chunk guard on accelerators, f32 on CPU.
"""
import os
import weakref

import numpy as np

#: per-process guard decisions, keyed by (kind, id(module)): True = bf16
#: validated. Entries are evicted when the module is garbage-collected
#: (weakref.finalize below) so a recycled object address can never inherit
#: an unrelated module's verdict.
_GUARD_DECISIONS = {}


def guard_min_cosine():
    return float(os.environ.get("MDIR_TPU_DTYPE_GUARD_MIN", "0.997"))


def train_guard_min_cosine():
    """Acceptance cosine for the *training* guard's flattened gradient.

    Calibrated on the real chip (resnet101-GeM contrastive step, 5 tuples
    @362^2): the bf16-trunk/f32-head split deviates from f32 by gradient
    cosine 0.981 with loss agreement to 1e-4, while the f32 gradient's own
    batch-sampling noise floor is cosine ~0.67 between adjacent batches —
    the dtype perturbation is ~30x smaller in angle than one SGD step's
    stochastic noise. 0.95 admits the mixed-precision split while still
    rejecting broken lowerings (a sign flip, a zeroed subtree, or loss
    drift — the 5% loss agreement check runs alongside either way).
    """
    return float(os.environ.get("MDIR_TPU_TRAIN_GUARD_MIN", "0.95"))


def on_accelerator():
    import jax

    try:
        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def resolve_compute_dtype(runtime=None):
    """-> (dtype_str_or_None, guard_wanted).

    ``None`` means f32 (no cast). ``guard_wanted`` asks the caller to
    validate the first chunk against f32 before committing to the fast
    dtype.
    """
    forced = os.environ.get("MDIR_TPU_COMPUTE_DTYPE")
    if forced is not None:
        if forced in ("", "float32", "f32"):
            return None, False
        return forced, False
    requested = (runtime or {}).get("compute_dtype", "auto")
    if requested in (None, "float32", "f32"):
        return None, False
    if requested == "auto":
        if not on_accelerator():
            return None, False
        return "bfloat16", True
    return requested, False


def guard_decision(module, kind="extract"):
    """Cached first-chunk verdict for this module (None = not yet checked).

    ``kind`` separates the extraction guard from the training-step guard —
    they validate different programs over the same module.
    """
    return _GUARD_DECISIONS.get((kind, id(module)))


def record_guard_decision(module, ok, kind="extract"):
    key = (kind, id(module))
    fresh = key not in _GUARD_DECISIONS
    _GUARD_DECISIONS[key] = bool(ok)
    if fresh:
        try:
            weakref.finalize(module, _GUARD_DECISIONS.pop, key, None)
        except TypeError:
            pass  # un-weakref-able module type: entry persists for the run


def cast_f32_tree(tree, dtype):
    """Cast every float32 leaf of a pytree to ``dtype`` (params/batch_stats
    pre-cast for fast-dtype programs; non-float and integer leaves pass
    through untouched)."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, tree)


def cosine_rows_ok(fast, exact, min_cosine=None):
    """Row-wise cosine acceptance between two (N, D) descriptor blocks."""
    fast = np.asarray(fast, np.float32)
    exact = np.asarray(exact, np.float32)
    denom = (np.linalg.norm(fast, axis=-1)
             * np.linalg.norm(exact, axis=-1) + 1e-12)
    cos = (fast * exact).sum(axis=-1) / denom
    return bool(cos.min() >= (min_cosine if min_cosine is not None
                              else guard_min_cosine()))
