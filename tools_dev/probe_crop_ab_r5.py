"""On-chip A/B: composed resident with vs without the embedder crop."""
import json, math, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

import jax
import jax.numpy as jnp
from mdir_tpu.models import initialize_model
from mdir_tpu.ops.dtypes import cast_f32_tree, resolve_compute_dtype
from mdir_tpu.parallel.extract import (_get_composed, composed_crop_hws,
                                       composed_pack_grids)

def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf[(0,) * (leaf.ndim - 1)][..., :1])

batch = 4
rh, rw, div = 768, 1024, 256
t_model = initialize_model({"architecture": "p2p_unet",
                            "in_channels": 3, "out_channels": 3})
e_model = initialize_model({
    "architecture": "cirnet", "cir_architecture": "vgg16",
    "local_whitening": False, "pooling": "gem", "regional": False,
    "whitening": False, "pretrained": False})
dtype, _ = resolve_compute_dtype({})
t_vars = cast_f32_tree(t_model.variables, dtype)
e_vars = cast_f32_tree(e_model.variables, dtype)
fused = _get_composed(t_model, e_model, True, dtype)

rng = np.random.RandomState(6)
dev_batch = jax.device_put(rng.randint(0, 256, (batch, rh, rw, 3)).astype(np.uint8))
mean = jnp.asarray(e_model.meta["mean"], jnp.float32)
std = jnp.asarray(e_model.meta["std"], jnp.float32)
msp = jnp.float32(float(e_model.pool_p))
scales = (1, 1.0 / math.sqrt(2), 0.5)
packs, pads = [], []
for scale in scales:
    sh = int(math.floor(rh * scale)) if scale != 1 else rh
    sw = int(math.floor(rw * scale)) if scale != 1 else rw
    ph, pw = -(-sh // div) * div, -(-sw // div) * div
    pads.append((ph, pw))
    yrow, xrow, valid_hw = composed_pack_grids(rh, rw, scale, div, ph, pw)
    packs.append((jnp.asarray(np.tile(np.array([valid_hw], np.int32), (batch, 1))),
                  jnp.asarray(np.tile(yrow[None], (batch, 1, 1))),
                  jnp.asarray(np.tile(xrow[None], (batch, 1, 1)))))
crops = composed_crop_hws((rh, rw), pads, scales)
print("crops:", crops, flush=True)
base = (t_vars, e_vars, dev_batch, tuple(packs), mean, std, msp)

outs = {}
for label, extra in [("nocrop", ()), ("crop", (crops,))]:
    _sync(fused(*base, *extra))  # compile + warm
    outs[label] = None
for trial in range(4):
    for label, extra in ([("nocrop", ()), ("crop", (crops,))]
                         if trial % 2 == 0 else
                         [("crop", (crops,)), ("nocrop", ())]):
        start = time.time()
        out = None
        for _ in range(4):
            out = fused(*base, *extra)
        _sync(out)
        outs.setdefault(label + "_t", []).append((time.time() - start) / 4)
        outs[label] = np.asarray(out, np.float64)

for label in ("nocrop", "crop"):
    ts = outs[label + "_t"]
    print(json.dumps({"probe": "composed_" + label,
                      "ms_best": round(min(ts) * 1e3, 1),
                      "imgs_per_sec_best": round(batch / min(ts), 2),
                      "ms_all": [round(t * 1e3, 1) for t in ts]}), flush=True)
d = np.abs(outs["crop"] - outs["nocrop"]).max()
print("max |crop - nocrop| descriptor delta:", d, flush=True)
