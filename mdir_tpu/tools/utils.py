"""Small shared utilities (hash-checked URL loading, param merging, misc).

Parity with reference ``mdir/tools/utils.py`` and
``cirtorch/utils/general.py`` behaviors, re-implemented.
"""
import copy
import hashlib
import io
import os
import pickle
import re
from urllib.request import urlopen


def get_root():
    """Data root: $MDIR_TPU_ROOT, or the repository root."""
    if os.environ.get("MDIR_TPU_ROOT", ""):
        return os.environ["MDIR_TPU_ROOT"]
    if os.environ.get("CIRTORCH_ROOT", ""):  # reference-compatible env var
        return os.environ["CIRTORCH_ROOT"]
    return os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def get_data_root():
    return os.path.join(get_root(), "data")


def get_dataset_params(params, net_defaults):
    """Merge network-embedded data defaults under per-dataset params."""
    return copy.deepcopy({**net_defaults, **params})


def indent(string, level=1):
    return string.replace("\n", "\n" + "    " * level)


def validate_hash(content, path):
    """Check content against the sha256 prefix embedded in the filename.

    Artifact names look like ``name-<hexdigest-prefix>.ext``; recompute and
    compare (reference ``tools/utils.py:27-41`` behavior).
    """
    match = re.search(r".*-([a-f0-9]{8,})\.[a-zA-Z0-9]{2,}$", path)
    if not match:
        return
    stored = match.group(1)
    computed = hashlib.sha256(content).hexdigest()[: len(stored)]
    if computed != stored:
        raise ValueError(
            "Computed hash '%s' is not consistent with stored hash '%s'"
            % (computed, stored))


def staged_artifact(url):
    """Offline artifact staging: ``$MDIR_TPU_ARTIFACTS/<basename>`` if present.

    Zero-egress environments pre-populate that directory; every URL fetch
    consults it before the network and still hash-validates the content.
    """
    root = os.environ.get("MDIR_TPU_ARTIFACTS")
    if not root:
        return None
    candidate = os.path.join(root, os.path.basename(url))
    return candidate if os.path.exists(candidate) else None


def load_url(url, cache_dir=None):
    """Download url into a BytesIO (or cached file path), verifying the hash.

    With cache_dir set, the file is stored under its basename and reused.
    A staged copy (``staged_artifact``) takes precedence over the network.
    """
    staged = staged_artifact(url)
    if staged is not None:
        with open(staged, "rb") as handle:
            content = handle.read()
        validate_hash(content, url)
        return staged if cache_dir else io.BytesIO(content)

    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        cached = os.path.join(cache_dir, os.path.basename(url))
        if not os.path.exists(cached):
            with urlopen(url) as handle:
                content = handle.read()
            validate_hash(content, url)
            tmp = cached + ".tmp"
            with open(tmp, "wb") as out:
                out.write(content)
            os.replace(tmp, cached)
        return cached

    with urlopen(url) as handle:
        loaded = io.BytesIO(handle.read())
    validate_hash(loaded.getvalue(), url)
    return loaded


def load_path(path):
    """Load a pickle from a local path or URL."""
    assert path.endswith(".pkl"), "Cannot load anything else than pickle at the moment"
    if path.startswith("http://") or path.startswith("https://"):
        return pickle.load(load_url(path))
    with open(path, "rb") as handle:
        return pickle.load(handle)


def parse_tuple(tpl, dtype=int):
    """Parse ``"512_512"``-style underscore tuples from the transform DSL."""
    if isinstance(tpl, str):
        return tuple(dtype(x) for x in tpl.split("_"))
    return tpl


def path_join(prefix, path):
    """Join, allowing absolute ``path`` to override the prefix."""
    if path.startswith("/"):
        return path
    return os.path.join(prefix, path)


def expect(condition, message="", debug=False):
    """Assert-like check with optional drop-into-pdb (daan.ml.tools.expect)."""
    if condition:
        return True
    if debug:
        import pdb

        pdb.set_trace()
    raise AssertionError(message or "expectation failed")


def htime(seconds):
    """Human-readable duration (cirtorch utils/general.py:15-29)."""
    c = round(seconds)
    days, hours = c // 86400, c // 3600 % 24
    minutes, secs = c // 60 % 60, c % 60
    if days > 0:
        return "%dd %dh %dm %ds" % (days, hours, minutes, secs)
    if hours > 0:
        return "%dh %dm %ds" % (hours, minutes, secs)
    if minutes > 0:
        return "%dm %ds" % (minutes, secs)
    return "%ds" % secs
