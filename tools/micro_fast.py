"""Micro-bench: XLA FAST+NMS chain vs the fused Pallas fast_nms kernel.

Runs both on KITTI-sized pyramid levels (both eyes batched where the
extractor vmaps) and checks bit-equality.
"""

import sys
sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from opendlv_perception_vision_orbslam2_tpu.ops import fast as fast_ops
from opendlv_perception_vision_orbslam2_tpu.ops import fast_pallas


def timeit(fn, *args, n=30):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    H, W = 376, 1241
    scale = 1.2
    th = 7.0

    @jax.jit
    def xla_chain(img):
        return fast_ops.nms_scores(fast_ops.fast_score_map(img, th))

    @jax.jit
    def xla_chain_b(imgs):
        return jax.vmap(lambda im: fast_ops.nms_scores(fast_ops.fast_score_map(im, th)))(imgs)

    @jax.jit
    def pallas_b(imgs):
        return jax.vmap(lambda im: fast_pallas.fast_nms(im, th))(imgs)

    tot_x = tot_p = 0.0
    for lvl in range(8):
        h, w = round(H / scale**lvl), round(W / scale**lvl)
        imgs = jnp.asarray(rng.uniform(0, 255, (2, h, w)), jnp.float32)
        tx = timeit(xla_chain_b, imgs)
        tp = timeit(pallas_b, imgs)
        a = np.asarray(xla_chain_b(imgs))
        b = np.asarray(pallas_b(imgs))
        # ignore the 4-px halo ring (masked by EDGE_BORDER=19 downstream)
        m = 8
        same = np.array_equal(a[:, m:-m, m:-m], b[:, m:-m, m:-m])
        print(f"L{lvl} {h}x{w}: xla {tx:.3f} ms  pallas {tp:.3f} ms  "
              f"speedup {tx/tp:.2f}x  bitexact(inner)={same}")
        tot_x += tx
        tot_p += tp
    print(f"total per frame (both eyes, 8 levels): xla {tot_x:.2f} ms  "
          f"pallas {tot_p:.2f} ms")


if __name__ == "__main__":
    main()
