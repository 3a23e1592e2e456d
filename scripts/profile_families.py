"""Micro-benchmark of individual conv families and ops at 3dpf shapes.

Locates the per-layer time: each family = edge-attr concat + MLP(3ns->3ns->
numel) + FasterTP + masked reduce, at the big-model late-layer dims.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffdock_pocket_tpu import runtime

runtime.setup()

import jax
import jax.numpy as jnp
import numpy as np

from diffdock_pocket_tpu.ops import aggregate, neighbors
from diffdock_pocket_tpu.ops.irreps import feature_ladder
from diffdock_pocket_tpu.ops.tensor_product import FasterTensorProduct

B, NL, NR, NA = 8, 64, 192, 1152
KL, KA, KLA, KR = 24, 8, 32, 24
ns, nv = 60, 10
H = 3 * ns

ladder = feature_ladder(ns, nv, False)
IN = str(ladder[3])
OUT = str(ladder[3])
tp = FasterTensorProduct(IN, "1x0e+1x1o", OUT, low_precision_weights=True)
DIN = ladder[3].dim
NUMEL = tp.weight_numel
print(f"late-layer dims: din={DIN} numel={NUMEL}")

key = jax.random.PRNGKey(0)


def timeit(fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000


def family(shape_edges, reduce_axis):
    """One conv family: W1+relu, W2->numel (bf16), TP, masked mean."""
    E = shape_edges
    attr = jax.random.normal(key, E + (H,))
    x_dst = jax.random.normal(key, E + (DIN,))
    sh = jax.random.normal(key, E + (4,))
    w1 = jax.random.normal(key, (H, H)) * 0.05
    w2 = jax.random.normal(key, (H, NUMEL)) * 0.05
    mask = jnp.ones(E, bool)

    @jax.jit
    def run(attr, x_dst, sh, w1, w2, mask):
        h = jax.nn.relu(attr @ w1)
        w = (h @ w2).astype(jnp.bfloat16)
        msgs = tp(x_dst, sh, w)
        return aggregate.masked_mean(msgs, mask, axis=reduce_axis)

    return timeit(run, attr, x_dst, sh, w1, w2, mask)


def main():
    print(f"{'lr dense [B,NL,NR]':38s} {family((B, NL, NR), 2):8.2f} ms")
    print(f"{'rl dense [B,NL,NR] (reduce ax1)':38s} {family((B, NL, NR), 1):8.2f} ms")
    print(f"{'atom knn [B,NA,KA]':38s} {family((B, NA, KA), 2):8.2f} ms")
    print(f"{'ar membership [B,NA]':38s} {family((B, NA), 1):8.2f} ms")
    print(f"{'rec knn [B,NR,KR]':38s} {family((B, NR, KR), 2):8.2f} ms")
    print(f"{'la list [B,NL,KLA]':38s} {family((B, NL, KLA), 2):8.2f} ms")
    print(f"{'lig radius [B,NL,KL]':38s} {family((B, NL, KL), 2):8.2f} ms")

    # topk over atoms
    pos = jax.random.normal(key, (B, NA, 3)) * 10
    mask = jnp.ones((B, NA), bool)

    @jax.jit
    def knn(pos, mask):
        return neighbors.topk_neighbors(pos, mask, pos, mask, KA, exclude_self=True)

    print(f"{'atom kNN top_k [B,NA,NA]':38s} {timeit(knn, pos, mask):8.2f} ms")

    # scatter_mean (al/ra reverse families)
    msgs = jax.random.normal(key, (B, NL * KLA, DIN))
    idx = jax.random.randint(key, (B, NL * KLA), 0, NA)
    ok = jnp.ones((B, NL * KLA), bool)

    @jax.jit
    def scat(msgs, idx, ok):
        return aggregate.scatter_mean_batched(msgs, idx, ok, NA)

    print(f"{'scatter_mean al [B,NL*KLA]->NA':38s} {timeit(scat, msgs, idx, ok):8.2f} ms")


if __name__ == "__main__":
    main()
