"""Microbenchmark: per-pixel gather cost vs atlas row width/dtype on TPU.

The shade stage is gather-bound (ROADMAP.md); this pins the cost model:
is a gather priced per FETCH (row count) or per CHANNEL (row width), and
does index locality (coherent vs random) matter? Informs the
reveal-pass/mip-tap design.

NOTE: tables must be RANDOM data fed as jit arguments — a jnp.zeros
table lets XLA constant-fold the whole gather+sum to a constant (an
earlier revision of this file measured exactly that: every row 0.04 ms).

Usage: python benchmarks/profile_gather.py [--batch 32] [--size 256]
"""

import sys

sys.path.insert(0, "/root/repo")

import argparse
import time

import jax
import jax.numpy as jnp


def timed(tag, fn, *args, n=8):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    chk = float(jnp.asarray(out).ravel()[0])
    print(f"{tag:44s} {dt * 1e3:8.2f} ms   (chk {chk:.3g})", flush=True)
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
    # coherent indices: neighboring pixels hit neighboring texels (the
    # real shade pattern — a magnified/minified texture walk)
    yc = (jnp.arange(H)[None, :, None] // 4 + jnp.arange(B)[:, None, None]) % AH
    yc = jnp.broadcast_to(yc, (B, H, W))
    xc = jnp.broadcast_to((jnp.arange(W)[None, None, :] // 4) % AW, (B, H, W))
    # same-index: every pixel fetches one row
    ys = jnp.zeros((B, H, W), jnp.int32)

    for ch in (4, 16, 32, 64):
        for dt in (jnp.float32, jnp.bfloat16):
            tbl = jax.random.uniform(jax.random.PRNGKey(2), (AH, AW, ch)).astype(dt)
            f = jax.jit(lambda t, y, x: t[y, x].astype(jnp.float32).sum(-1))
            timed(f"random  gather [{AH},{AW},{ch}] {dt.__name__}", f, tbl, yi, xi)
            if ch == 16:
                timed(f"coherent gather [{AH},{AW},{ch}] {dt.__name__}", f, tbl, yc, xc)
                timed(f"same-idx gather [{AH},{AW},{ch}] {dt.__name__}", f, tbl, ys, ys)

    # small vs large table at 16ch (page/cache locality)
    for ah in (128, 512, 2048):
        tbl = jax.random.uniform(jax.random.PRNGKey(3), (ah, 2048, 16))
        yi2 = jax.random.randint(key, (B, H, W), 0, ah)
        xi2 = jax.random.randint(jax.random.PRNGKey(4), (B, H, W), 0, 2048)
        f = jax.jit(lambda t, y, x: t[y, x].sum(-1))
        timed(f"random  gather [{ah},2048,16] f32", f, tbl, yi2, xi2)

    # flat-index variant (single-axis gather)
    tblf = jax.random.uniform(jax.random.PRNGKey(5), (AH * AW, 16))
    flat = yi * AW + xi
    f = jax.jit(lambda t, i: t[i].sum(-1))
    timed("random  gather flat [AH*AW,16] f32", f, tblf, flat)

    # 2 gathers of 16 vs 1 of 32 (the trilinear question)
    tbl16 = jax.random.uniform(jax.random.PRNGKey(6), (AH, AW, 16))
    f2 = jax.jit(lambda t, y, x: (t[y, x] + t[x, y]).sum(-1))
    timed("2x random gather 16ch f32", f2, tbl16, yi, xi)


if __name__ == "__main__":
    main()
