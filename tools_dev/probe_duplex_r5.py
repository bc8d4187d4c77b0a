"""Is the axon tunnel full-duplex? Measure up, down, and concurrent."""
import sys, time, threading
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

MB = 24
up_host = np.random.RandomState(0).randint(0, 255, (MB * 1000 * 1000,), dtype=np.uint8)
# device-PRODUCED array: a host-sourced one answers np.asarray from the
# committed host copy without touching the wire
dev_big = jax.jit(lambda x: x + jnp.uint8(1))(jnp.asarray(up_host))
_ = np.asarray(dev_big[:8])  # sync

def up_once():
    d = jnp.asarray(up_host)
    _ = np.asarray(d[:8])  # force the wire to drain
    return d

_add1 = jax.jit(lambda x: x + jnp.uint8(1))

def down_once():
    # fresh device-produced result every call: np.asarray caches per-Array,
    # so re-reading the same Array never touches the wire twice
    fresh = _add1(dev_big)
    return np.asarray(fresh)

# warm
up_once(); down_once()

t0 = time.time(); up_once(); t_up = time.time() - t0
t0 = time.time(); down_once(); t_down = time.time() - t0
print("up %.2f s (%.1f MB/s)  down %.2f s (%.1f MB/s)"
      % (t_up, MB / t_up, t_down, MB / t_down), flush=True)

res = {}
def worker(name, fn):
    t0 = time.time(); fn(); res[name] = time.time() - t0

t0 = time.time()
a = threading.Thread(target=worker, args=("up", up_once))
b = threading.Thread(target=worker, args=("down", down_once))
a.start(); b.start(); a.join(); b.join()
both = time.time() - t0
print("concurrent: up %.2f s down %.2f s wall %.2f s -> duplex_gain %.2fx"
      % (res["up"], res["down"], both, (t_up + t_down) / both), flush=True)
