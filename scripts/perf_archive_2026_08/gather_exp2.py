"""Gather strategy comparison with FORCED execution (scalar fetch).

The tunneled TPU backend does not synchronize on block_until_ready; every
measurement here reduces to a scalar and fetches it to host.
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

from pgdvs_tpu.core.interpolate import bilinear_sample

H, W, V = 288, 550, 10
R, S = 2048, 256
N = R * S
rng = np.random.default_rng(0)

rgbs = jnp.asarray(rng.normal(size=(V, H, W, 3)).astype(np.float32)).astype(jnp.bfloat16)
feats = jnp.asarray(
    rng.normal(size=(V, H // 4, W // 4, 32)).astype(np.float32)
).astype(jnp.bfloat16)
xs = [jnp.asarray(rng.uniform(0, W - 2, (V, R, S)).astype(np.float32)) for _ in range(4)]
ys = [jnp.asarray(rng.uniform(0, H - 2, (V, R, S)).astype(np.float32)) for _ in range(4)]


def timeit(name, fn, argsets, iters=3):
    try:
        _ = float(fn(*argsets[0]))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"exp": name, "error": str(e)[:300]}), flush=True)
        return
    t0 = time.time()
    for i in range(iters):
        _ = float(fn(*argsets[(i + 1) % len(argsets)]))
    ms = (time.time() - t0) / iters * 1e3
    print(json.dumps({"exp": name, "ms": round(ms, 1)}), flush=True)


# 1. current bilinear (rgb: taps path)
f_rgb = jax.jit(lambda a, b: jnp.sum(jax.vmap(bilinear_sample)(rgbs, a, b)))
timeit("rgb_bilinear_current", f_rgb, [(xs[i], ys[i]) for i in range(4)])

# 2. current bilinear (feat: patch-gather path)
f_feat = jax.jit(
    lambda a, b: jnp.sum(jax.vmap(bilinear_sample)(feats, a * 0.25, b * 0.25))
)
timeit("feat_bilinear_current", f_feat, [(xs[i], ys[i]) for i in range(4)])


# 3. flat-offset-index 4-tap bilinear (single gather space for all views)
def flat_bilinear(imgs, x, y):
    v, h, w, c = imgs.shape
    flat = imgs.reshape(v * h * w, c)
    offs = (jnp.arange(v, dtype=jnp.int32) * (h * w)).reshape(v, 1, 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(imgs.dtype)
    fy = (y - y0).astype(imgs.dtype)
    base = (y0.astype(jnp.int32) * w + x0.astype(jnp.int32) + offs).reshape(-1)
    out = 0.0
    for dd, wgt in (
        (0, (1 - fx) * (1 - fy)),
        (1, fx * (1 - fy)),
        (w, (1 - fx) * fy),
        (w + 1, fx * fy),
    ):
        out = out + jnp.take(flat, base + dd, axis=0) * wgt.reshape(-1, 1)
    return jnp.sum(out)


timeit(
    "rgb_flat_offset_4tap",
    jax.jit(lambda a, b: flat_bilinear(rgbs, a, b)),
    [(xs[i], ys[i]) for i in range(4)],
)
timeit(
    "feat_flat_offset_4tap",
    jax.jit(lambda a, b: flat_bilinear(feats, a * 0.25, b * 0.25)),
    [(xs[i], ys[i]) for i in range(4)],
)


# 4. rgb+feat fused: widen rgb channels to 32 by gathering feats and rgb with
#    one shared index space is impossible (different res) — instead measure a
#    35-channel single map at feat resolution as the hypothetical fused cost
fused = jnp.asarray(
    rng.normal(size=(V, H // 4, W // 4, 35)).astype(np.float32)
).astype(jnp.bfloat16)
timeit(
    "fused35_quarter_res_4tap",
    jax.jit(lambda a, b: flat_bilinear(fused, a * 0.25, b * 0.25)),
    [(xs[i], ys[i]) for i in range(4)],
)

# 5. feat in f32 for comparison
feats32 = feats.astype(jnp.float32)
timeit(
    "feat_flat_offset_4tap_f32",
    jax.jit(lambda a, b: flat_bilinear(feats32, a * 0.25, b * 0.25)),
    [(xs[i], ys[i]) for i in range(4)],
)
