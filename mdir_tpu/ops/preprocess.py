"""In-graph (device) preprocessing chains.

The host transform DSL (``data/transforms.py``) is exact but serial on this
1-core host; supported photometric chains instead run fused on device from
raw uint8 ingress. Two entry points:

* ``make_device_preprocess`` — fixed-size batches (training crops): uint8
  RGB -> /255 -> colorspace -> CLAHE (cv2 semantics, vmapped) -> back ->
  normalize, one jitted program.
* ``chain_from_transform`` + ``make_bucketed_chain`` — the PRODUCTION path
  (parallel/extract.py, learning/train_step.py): lowers a host Compose onto
  padded buckets with per-image valid extents. CLAHE input is the shipped
  cv2 L plane (bit-identical to the host chain; see DeviceChain), the tile
  geometry is cv2-exact per image (ops/clahe.py bucketed kernels), and the
  residual device-vs-host delta is only the ~1e-4 colorspace round trip on
  non-L channels (mAP-identical in the validate stage). Enabled by default;
  ``MDIR_TPU_DEVICE_PREPROCESS=0`` opts out.

Supported DSL subset: ``pil2np | [apply_clahe[:clip[:space[:grid]]] |
add_clahe_fromrgb[:clip[:grid[:space]]] | tospace:<space>] | totensor |
normalize``.
"""
import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np

from . import clahe as clahe_ops
from . import colorspace as cs


def _parse_chain(chain):
    steps = []
    for item in [x.strip() for x in chain.split("|") if x.strip()]:
        name, *args = item.split(":")
        steps.append((name, args))
    return steps


SUPPORTED = {"pil2np", "apply_clahe", "add_clahe_fromrgb", "tospace",
             "totensor", "normalize"}


def supports_chain(chain):
    steps = _parse_chain(chain)
    return bool(steps) and all(name in SUPPORTED for name, _ in steps) \
        and steps[-1][0] == "normalize"


def make_device_preprocess(chain, mean_std):
    """Jitted fn: uint8 (N, H, W, 3) -> preprocessed float32 (N, H, W, C)."""
    steps = _parse_chain(chain)
    assert supports_chain(chain), chain
    mean = jnp.asarray(mean_std[0], jnp.float32)
    std = jnp.asarray(mean_std[1], jnp.float32)

    def apply_clahe_img(img, clip, space, grid):
        spc = cs.rgb2normspace(img, space)
        chan = clahe_ops.clahe_channel_jax(spc[..., 0], clip, grid)
        spc = spc.at[..., 0].set(chan)
        return cs.normspace2rgb(spc, space)

    def add_clahe_img(img, clip, grid, space):
        spc = cs.rgb2normspace(img[..., :3], space)
        chan = clahe_ops.clahe_channel_jax(spc[..., 0], clip, grid)
        return jnp.concatenate([img, chan[..., None]], axis=-1)

    @jax.jit
    def fn(batch_u8):
        x = batch_u8.astype(jnp.float32) / 255.0
        for name, args in steps:
            if name in ("pil2np", "totensor"):
                continue
            if name == "apply_clahe":
                clip = float(args[0]) if args else 4.0
                space = args[1] if len(args) > 1 else "lab"
                grid = (int(args[2]),) * 2 if len(args) > 2 else (8, 8)
                x = jax.vmap(lambda im: apply_clahe_img(
                    im, float(int(clip)), space, grid))(x)
            elif name == "add_clahe_fromrgb":
                clip = float(args[0]) if args else 4.0
                grid = (int(args[1]),) * 2 if len(args) > 1 else (8, 8)
                space = args[2] if len(args) > 2 else "lab"
                x = jax.vmap(lambda im: add_clahe_img(
                    im, float(int(clip)), grid, space))(x)
            elif name == "tospace":
                x = cs.rgb2normspace(x[..., :3], args[0])
            elif name == "normalize":
                c = x.shape[-1]
                x = (x - mean[:c]) / std[:c]
        return x

    return fn


# ---------------------------------------------------------------------------
# Production path: host-transform detection + bucketed device chains
# ---------------------------------------------------------------------------
#
# ``chain_from_transform`` inspects a host Compose (data/transforms.py) and,
# when every step has a device equivalent, returns a spec the bucketed
# extractor (parallel/extract.py) runs fused on device from raw uint8
# ingress: 4x less host->device transfer and zero per-image host CPU beyond
# decode — the reference instead runs CLAHE inside 6 DataLoader worker
# processes (mdir/components/data/dataset/__init__.py:15-19) which this
# 1-core host cannot afford. CLAHE on padded buckets uses the
# valid-extent-aware kernels (ops/clahe.py::clahe_u8_bucketed_jax,
# bit-exact vs cv2 tile geometry at every image's true size).

def _float_l_u8(batch_u8, space):
    """Device u8 CLAHE plane for float-colorspace chains (luv): the host's
    ``(chan0 * 255).astype(uint8)`` reproduced with floor+clip (identical
    for the non-negative values both sides produce). Luv L rides the
    analytic-Y contraction — the curve cv2's float Luv actually uses
    (``cs.rgb_u8_to_luv_l``)."""
    if space == "luv":
        chan0 = cs.rgb_u8_to_luv_l(batch_u8[..., :3]) / 100.0
    else:
        chan0 = cs.rgb_u8_to_normspace(batch_u8[..., :3], space)[..., 0]
    return jnp.clip(jnp.floor(chan0 * 255.0), 0, 255).astype(jnp.int32)


@functools.lru_cache(maxsize=4)
def float_l_spot_check(space, samples=4096, seed=0):
    """Runtime guard for device CLAHE planes that have no exact integer
    pipeline (cv2's Luv conversion is genuine float math in this build —
    probed non-lattice, so no trilinear-lattice replica exists).

    Runs the ACTUAL device computation (``_float_l_u8``) on a sampled u8
    sweep vs the live cv2 host plane and accepts only when every deviation
    is an off-by-one quantization flip at a rare rate (<=2%): a +-1 CLAHE
    input bin moves that pixel's CLAHE output by at most the local tile-LUT
    slope (~1e-2 normalized), far inside the float colorspace round-trip
    tolerance the chain already carries (reference
    ``mdir/components/data/transform/functional.py:24-48,109-129``).
    Measured on this chip: 0 flips of 4096 on the random sweep; the dense
    sweep in ``tests/test_exact_l.py`` bounds the rate at <0.2%.
    """
    try:
        from ..data.transforms import rgb2normspace_np
    except ImportError:  # pragma: no cover
        return False
    rng = np.random.RandomState(seed)
    u8 = rng.randint(0, 256, (samples, 3))
    u8[:256] = np.stack([np.arange(256)] * 3, -1)  # gray ramp
    u8[256:288, 1:] = 0                            # single-channel edges
    u8 = u8.astype(np.uint8)
    try:
        host = (rgb2normspace_np(u8[None].astype(np.float32) / 255.0,
                                 space)[0, :, 0] * 255).astype(np.uint8)
    except Exception:  # pragma: no cover - cv2 missing/unsupported space
        return False
    try:
        dev = np.asarray(jax.jit(functools.partial(_float_l_u8, space=space))(
            jnp.asarray(u8.reshape(1, 16, -1, 3)))).reshape(-1)
    except Exception:  # pragma: no cover - no usable backend
        return False
    diff = np.abs(dev - host.astype(np.int32))
    return bool(diff.max() <= 1 and (diff != 0).mean() <= 0.02)


class DeviceChain:
    """A host transform chain lowered to a device program over u8 buckets.

    CLAHE's u8 input plane must be bit-identical to the host chain's (cv2's
    quantized lightness channel) — tile-LUT bin flips would otherwise break
    the pinned cv2 bit-exactness. Two ways to get it:

    * ``device_l`` (default for lab/lsh): the plane is recomputed ON DEVICE,
      bit-exactly, from the raw RGB (``ops/lab_trilinear.py`` replicates
      cv2's fixed-point trilinear pipeline; verified exhaustively over all
      256^3 triples). Ingress is plain 3-plane uint8 and the host does no
      cv2.cvtColor at all.
    * ``ships_l`` (fallback: other spaces, ``MDIR_TPU_SHIP_L=1``, or a cv2
      whose algorithm fails the sampled spot check): the loader ships the
      host-computed plane as a 4th uint8 channel.

    Either way ingress stays uint8 (3-4 B/px vs 12 B/px host-float), and the
    only residual device-vs-host difference is the ~1e-3 colorspace round
    trip on the non-L channels.
    """

    def __init__(self, steps, mean_std):
        self.steps = steps
        self.mean_std = ([float(m) for m in mean_std[0]],
                         [float(s) for s in mean_std[1]])
        clahe = [args for name, args in steps
                 if name in ("apply_clahe", "add_clahe_fromrgb")]
        assert len(clahe) <= 1, "one CLAHE step per chain"
        self.device_l = False
        self.exact_lab = False
        conservative = _os.environ.get("MDIR_TPU_SHIP_L", "0") == "1"
        touches_lab = any(
            (name in ("apply_clahe", "add_clahe_fromrgb")
             and args[1] == "lab")
            or (name == "tospace" and args[0].lower() == "lab")
            for name, args in steps)
        if not conservative and touches_lab:
            from .lab_trilinear import device_corner_check, spot_check

            # exact trilinear lab conversion (a/b channels included) is
            # used wherever the chain touches lab space; both the numpy
            # replica (vs live cv2) and the device corner quantization
            # (vs the exact tables) must check out
            self.exact_lab = spot_check("lab") and device_corner_check()
        if clahe:
            clip, space, grid = clahe[0]
            self.clahe_params = (float(clip), (int(grid), int(grid)))
            self.clahe_space = space
            if not conservative:
                from .lab_trilinear import device_corner_check, spot_check

                if space in ("lab", "lsh"):
                    self.device_l = spot_check(space) \
                        and (space != "lab" or device_corner_check())
                elif space == "luv":
                    # no exact lattice exists (genuine float cv2 path);
                    # the float plane ships only past its runtime guard
                    self.device_l = float_l_spot_check(space)
        else:
            self.clahe_params = None
            self.clahe_space = None

    @property
    def ships_l(self):
        return self.clahe_params is not None and not self.device_l

    def host_input(self, img_u8):
        """Loader-side raw input: RGB u8, plus the cv2 L u8 plane if CLAHE."""
        img_u8 = np.asarray(img_u8, np.uint8)
        if not self.ships_l:
            return img_u8
        from ..data.transforms import rgb2normspace_np

        spc = rgb2normspace_np(img_u8.astype(np.float32) / 255.0,
                               self.clahe_space)
        l_u8 = (spc[..., 0] * 255).astype(np.uint8)
        return np.concatenate([img_u8, l_u8[..., None]], axis=-1)

    @property
    def key(self):
        return (tuple((n, tuple(a)) for n, a in self.steps),
                tuple(self.mean_std[0]), tuple(self.mean_std[1]),
                self.device_l, self.exact_lab)


def chain_from_transform(transform):
    """Translate a host Compose into a DeviceChain, or None if unsupported."""
    ts = getattr(transform, "transforms", None)
    if not ts:
        return None
    from ..data import transforms as T

    steps = []
    for t in ts:
        if isinstance(t, (T.Pil2Numpy, T.ToTensor)):
            continue
        if isinstance(t, T.Normalize):
            if not t.params["strict_shape"]:
                return None
            steps.append(("normalize", ()))
        elif isinstance(t, T.ApplyClahe) and not isinstance(
                t, T.CreateClahedImage):
            if any(n == "tospace" for n, _ in steps):
                # the device CLAHE plane derives from the RAW ingress RGB;
                # after a host tospace the host chain would derive it from
                # the converted planes instead — lowering that ordering
                # would silently produce device != host outputs
                return None
            p = t.params  # DSL-parsed params may arrive as strings
            steps.append(("apply_clahe", (float(int(p["clip_limit"])),
                                          str(p["colorspace"]),
                                          int(p["grid_size"]))))
        elif isinstance(t, T.AddClaheFromRgb):
            if any(n == "tospace" for n, _ in steps):
                return None  # same raw-RGB derivation constraint as above
            p = t.params
            steps.append(("add_clahe_fromrgb", (float(int(p["clip_limit"])),
                                                str(p["colorspace"]),
                                                int(p["grid_size"]))))
        elif isinstance(t, T.ToColorspace):
            if t.params["colorspace"].lower() == "gray":
                return None  # changes channel count pre-CLAHE; host path
            steps.append(("tospace", (t.params["colorspace"],)))
        else:
            return None
    if not steps or steps[-1][0] != "normalize" \
            or any(n == "normalize" for n, _ in steps[:-1]):
        return None
    norm = ts[-1]
    if not isinstance(norm, T.Normalize):
        return None
    return DeviceChain(steps[:-1] + [("normalize", ())],
                       (norm.params["mean"], norm.params["std"]))


def make_bucketed_chain(chain):
    """Device fn for a DeviceChain over padded u8 buckets.

    Returns ``fn(batch_u8, clahe_aux) -> float32 batch`` (traced inside the
    extraction program; ``clahe_aux`` comes from ``ops.clahe.clahe_bucket_aux``
    and is None for CLAHE-less chains). Output is garbage outside each
    image's valid extent — the caller masks in normalized space.
    """
    mean = jnp.asarray(chain.mean_std[0], jnp.float32)
    std = jnp.asarray(chain.mean_std[1], jnp.float32)
    device_l = chain.device_l
    exact_lab = chain.exact_lab
    clahe_space = chain.clahe_space

    def clahe_chan(batch_u8, aux, grid):
        # CLAHE's u8 input plane is bit-identical to the host chain's: either
        # recomputed on device (lab_trilinear, exhaustively cv2-exact) or
        # shipped as the 4th uint8 channel (see DeviceChain docstring)
        if device_l:
            if clahe_space == "luv":
                l_u8 = _float_l_u8(batch_u8, clahe_space)
            else:
                from .lab_trilinear import lab_l_u8, lsh_l_u8_jax

                fn = lab_l_u8 if clahe_space == "lab" else lsh_l_u8_jax
                l_u8 = fn(batch_u8[..., :3])
        else:
            l_u8 = batch_u8[..., 3].astype(jnp.int32)
        return clahe_ops.clahe_u8_bucketed_jax(l_u8, aux, grid) / 255.0

    def fn(batch_u8, clahe_aux):
        x = batch_u8[..., :3].astype(jnp.float32) / 255.0
        raw = True  # x still == batch_u8/255: the gather-free u8 path applies
        for name, args in chain.steps:
            if name == "apply_clahe":
                clip, space, grid = args
                if raw and exact_lab and space == "lab":
                    # one trilinear contraction yields the CLAHE plane AND
                    # the a/b channels, all bit-exact with the host cv2
                    # conversion (the extra matmul columns are free)
                    from .lab_trilinear import lab_chan

                    l_u8, ab = lab_chan(batch_u8[..., :3])
                    chan = clahe_ops.clahe_u8_bucketed_jax(
                        l_u8, clahe_aux, (grid, grid)) / 255.0
                    spc = jnp.concatenate([chan[..., None], ab], axis=-1)
                else:
                    chan = clahe_chan(batch_u8, clahe_aux, (grid, grid))
                    if raw:
                        spc = cs.rgb_u8_to_normspace(batch_u8[..., :3], space)
                    else:
                        spc = cs.rgb2normspace(x[..., :3], space)
                    spc = spc.at[..., 0].set(chan)
                x = cs.normspace2rgb(spc, space)
                raw = False
            elif name == "add_clahe_fromrgb":
                clip, space, grid = args
                chan = clahe_chan(batch_u8, clahe_aux, (grid, grid))
                x = jnp.concatenate([x, chan[..., None]], axis=-1)
            elif name == "tospace":
                if raw and exact_lab and args[0].lower() == "lab":
                    from .lab_trilinear import lab_normspace

                    x = lab_normspace(batch_u8[..., :3])
                elif raw:
                    x = cs.rgb_u8_to_normspace(batch_u8[..., :3], args[0])
                else:
                    x = cs.rgb2normspace(x[..., :3], args[0])
                raw = False
            elif name == "normalize":
                c = x.shape[-1]
                x = (x - mean[:c]) / std[:c]
        return x

    return fn


class RawChainInput:
    """``__getitem__``-side replacement for a host chain lowered to device:
    emits the raw uint8 planes ``DeviceChain.host_input`` defines."""

    def __init__(self, chain):
        self.chain = chain

    def __call__(self, *pics):
        acc = []
        for pic in pics:
            if not isinstance(pic, np.ndarray):
                pic = np.asarray(pic.convert("RGB"), np.uint8)
            elif pic.dtype != np.uint8:
                pic = np.clip(pic * 255.0, 0, 255).astype(np.uint8)
            acc.append(self.chain.host_input(pic))
        return acc[0] if len(acc) == 1 else acc
