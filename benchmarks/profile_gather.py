"""Microbenchmark: per-pixel gather cost vs atlas row width/dtype on TPU.

The shade stage is gather-bound (ROADMAP.md); this pins the cost model:
is a gather priced per FETCH (row count) or per CHANNEL (row width)?
Informs the reveal-pass/mip-tap redesign.

Usage: python benchmarks/profile_gather.py [--batch 32] [--size 256]
"""

import sys

sys.path.insert(0, "/root/repo")

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(tag, fn, *args, n=8):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{tag:44s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()
    B, H, W = args.batch, args.size, args.size
    key = jax.random.PRNGKey(0)
    AH = AW = 1024

    yi = jax.random.randint(key, (B, H, W), 0, AH)
    xi = jax.random.randint(jax.random.PRNGKey(1), (B, H, W), 0, AW)

    for ch in (1, 4, 8, 16, 32, 52, 64):
        for dt in (jnp.float32, jnp.bfloat16):
            tbl = jnp.zeros((AH, AW, ch), dt)
            f = jax.jit(lambda t, y, x: t[y, x].astype(jnp.float32).sum(-1))
            timed(f"gather [{AH},{AW},{ch}] {dt.__name__}", f, tbl, yi, xi)

    # flat-index variant (single-axis gather)
    tblf = jnp.zeros((AH * AW, 16), jnp.float32)
    flat = yi * AW + xi
    f = jax.jit(lambda t, i: t[i].sum(-1))
    timed("gather flat [AH*AW,16] f32", f, tblf, flat)

    # 2 gathers of 16 vs 1 of 32 (the trilinear question)
    tbl16 = jnp.zeros((AH, AW, 16), jnp.float32)
    f2 = jax.jit(lambda t, y, x: (t[y, x] + t[x, y]).sum(-1))
    timed("2x gather 16ch f32", f2, tbl16, yi, xi)


if __name__ == "__main__":
    main()
