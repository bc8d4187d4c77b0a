"""CPU decomposition of the composed program's XLA bytes-accessed.

Builds the production composed fused fn at batch 1 (3 scales of 768x1024)
and compares its cost_analysis against partial programs to find where the
bytes go. CPU fusion differs from TPU but the overcount structure shows.
"""
import math
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from mdir_tpu.models import initialize_model
from mdir_tpu.ops.dtypes import cast_f32_tree
from mdir_tpu.parallel.extract import _get_composed, composed_pack_grids

B = 1
rh, rw = 768, 1024
div = 256

t_model = initialize_model({"architecture": "p2p_unet",
                            "in_channels": 3, "out_channels": 3})
e_model = initialize_model({
    "architecture": "cirnet", "cir_architecture": "vgg16",
    "local_whitening": False, "pooling": "gem", "regional": False,
    "whitening": False, "pretrained": False})
dt = jnp.bfloat16
t_vars = cast_f32_tree(t_model.variables, dt)
e_vars = cast_f32_tree(e_model.variables, dt)

rng = np.random.RandomState(6)
batch = jnp.asarray(rng.randint(0, 256, (B, rh, rw, 3)).astype(np.uint8))
mean = jnp.asarray(e_model.meta["mean"], jnp.float32)
std = jnp.asarray(e_model.meta["std"], jnp.float32)
msp = jnp.float32(3.0)

packs = []
shapes = []
for scale in (1, 1.0 / math.sqrt(2), 0.5):
    sh = int(math.floor(rh * scale)) if scale != 1 else rh
    sw = int(math.floor(rw * scale)) if scale != 1 else rw
    ph, pw = -(-sh // div) * div, -(-sw // div) * div
    yrow, xrow, valid_hw = composed_pack_grids(rh, rw, scale, div, ph, pw)
    ypack = jnp.asarray(np.tile(yrow[None], (B, 1, 1)))
    xpack = jnp.asarray(np.tile(xrow[None], (B, 1, 1)))
    valid = jnp.asarray(np.tile(np.array([valid_hw], np.int32), (B, 1)))
    packs.append((valid, ypack, xpack))
    shapes.append((ph, pw))
print("padded shapes:", shapes)


def cost(fn, *args):
    lowered = jax.jit(fn).lower(*args)
    c = lowered.compile().cost_analysis()
    c = c[0] if isinstance(c, (list, tuple)) else c
    return (float(c.get("flops", 0)) / 1e9,
            float(c.get("bytes accessed", 0)) / 1e9)


fused = _get_composed(t_model, e_model, True, "bfloat16")
fl, by = cost(lambda tv, ev, b, p, m, s, mp: fused(tv, ev, b, p, m, s, mp),
              t_vars, e_vars, batch, tuple(packs), mean, std, msp)
print(f"full composed (b{B}, 3 scales): {fl:.1f} GF  {by:.2f} GB")

# unet alone at each padded shape
tmod = t_model.module
for (ph, pw) in shapes:
    x = jnp.zeros((B, ph, pw, 3), dt)
    fl, by = cost(lambda v, x: tmod.apply(v, x, train=False), t_vars, x)
    print(f"unet {ph}x{pw}: {fl:.1f} GF  {by:.2f} GB")

# vgg16+gem alone at each padded shape
emod = e_model.module
for (ph, pw) in shapes:
    x = jnp.zeros((B, ph, pw, 3), dt)
    vh = jnp.asarray(np.tile(np.array([[ph, pw]], np.int32), (B, 1)))
    fl, by = cost(lambda v, x, vh: emod.apply(v, x, valid_hw=vh),
                  e_vars, x, vh)
    print(f"vgg {ph}x{pw}: {fl:.1f} GF  {by:.2f} GB")
