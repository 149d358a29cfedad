import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
from c_game_engine_tpu.compiler.compile import compile_map
from c_game_engine_tpu.core.actions import Actions
from c_game_engine_tpu.models.sim import reset_batch, step_batch
from c_game_engine_tpu.physics import batched

B = 4096
cmap = compile_map("/root/reference/assets/game/map/shapes.gmap")
state = reset_batch(cmap, B)
# settle 30 ticks
acts = Actions.zeros((B,))
f = jax.jit(lambda s, a: step_batch(cmap, s, a))
for _ in range(30):
    state = f(state, acts)
jax.block_until_ready(state)

def timeit(name, fn, *args, n=50):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:24s} {dt*1e3:8.3f} ms")
    return dt

full = timeit("full tick", f, state, acts)

bodies = jax.jit(lambda s: batched.step_bodies_batched(cmap, s.actors, s.player.pos, s.player.vel, 1.0/60.0))
tb = timeit("step_bodies", bodies, state)

char = jax.jit(lambda s: batched.update_character_batched(cmap, s.actors, s.player.pos, s.player.vel, 1.0/60.0, s.player.on_ground, jnp.zeros(B, bool), s.player.noclip))
tc = timeit("character", char, state)

import numpy as np
R = B
orig = jnp.broadcast_to(jnp.array([0.,0.,0.]), (R,3))
dirs = jnp.broadcast_to(jnp.array([1.,0.,0.]), (R,3))
rays = jax.jit(lambda s: batched.cast_rays_batched(cmap, s.actors, orig, dirs, 10.0, B_env=B))
tr = timeit("rays(1/env)", rays, state)
print(f"sum of 3 stages {1e3*(tb+tc+tr):.3f} ms; full {1e3*full:.3f}; other {1e3*(full-tb-tc-tr):.3f}")
