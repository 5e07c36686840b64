"""Cost of materializing a (T, 128) record table from channel-major
(128, T) planes — the one new op the planar triangle pipeline needs.
Run: python tools/exp_transpose.py"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bibim_tpu.utils.cache import enable_compilation_cache


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    print(f"{name:44s} {(time.perf_counter() - t0) / iters * 1e3:8.3f} ms",
          flush=True)


def main():
    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    for t in (16384, 655360):
        cm = jax.random.normal(key, (128, t), jnp.float32)

        @jax.jit
        def tr(x):
            def body(c, _):
                out = jnp.transpose(x + c, (1, 0))
                return c + 1e-7, out

            _, outs = lax.scan(body, jnp.float32(0), None, length=8)
            return outs[-1]

        timeit(f"transpose (128,{t}) -> ({t},128) x8", tr, cm)

        planes = [cm[i] for i in range(60)]

        @jax.jit
        def stack60(x):
            ps = [x[i] for i in range(60)]

            def body(c, _):
                out = jnp.stack([p + c for p in ps], axis=-1)
                return c + 1e-7, out

            _, outs = lax.scan(body, jnp.float32(0), None, length=8)
            return outs[-1]

        timeit(f"stack 60 (T,) planes -> ({t},60) x8", stack60, cm)

        @jax.jit
        def pad_tr(x):
            def body(c, _):
                out = jnp.transpose(x[:60] + c, (1, 0))
                out = jnp.pad(out, ((0, 0), (0, 68)))
                return c + 1e-7, out

            _, outs = lax.scan(body, jnp.float32(0), None, length=8)
            return outs[-1]

        timeit(f"transpose60+pad (60,{t}) x8", pad_tr, cm)


if __name__ == "__main__":
    main()
