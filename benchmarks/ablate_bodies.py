import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
from c_game_engine_tpu.compiler.compile import compile_map
from c_game_engine_tpu.core.actions import Actions
from c_game_engine_tpu.models.sim import reset_batch, step_batch
from c_game_engine_tpu.physics import batched

B = 4096
cmap = compile_map("/root/reference/assets/game/map/shapes.gmap")
print("N slots", cmap.num_actors, "D", cmap.dyn_slots.shape[0], "T", cmap.tris.shape[0])
state = reset_batch(cmap, B)
f = jax.jit(lambda s, a: step_batch(cmap, s, a))
for _ in range(30):
    state = f(state, Actions.zeros((B,)))
jax.block_until_ready(state)

def timeit(name, fn, *args, n=50):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt*1e3:8.3f} ms")
    return dt

def body_fn(s):
    return batched.step_bodies_batched(cmap, s.actors, s.player.pos, s.player.vel, 1.0/60.0)

t_full = timeit("bodies full", jax.jit(body_fn), state)
batched.SOLVER_ITERS = 1
t_s1 = timeit("bodies solver=1", jax.jit(lambda s: body_fn(s)), state)
batched.SOLVER_ITERS = 8
batched.PAIR_ITERS = 0
t_p0 = timeit("bodies pair=0", jax.jit(lambda s: body_fn(s)), state)
batched.PAIR_ITERS = 2

# contact kernel alone
from c_game_engine_tpu.ops.body_contacts import body_contacts_pallas
import numpy as np
sl = cmap.dyn_slots; D = sl.shape[0]; n = cmap.num_actors
slc = jnp.clip(sl, 0, n - 1)
a = state.actors
dpx = a.pos[:, slc, 0].T; dpy = a.pos[:, slc, 1].T; dpz = a.pos[:, slc, 2].T
T = cmap.tri_soa.shape[1]
tri16 = jnp.concatenate([cmap.tri_soa.T, cmap.tri_valid[:, None].astype(jnp.float32), jnp.zeros((T,3), jnp.float32)], 1)
from c_game_engine_tpu.ops.capsule_resolve import T_CHUNK
t_pad = (-T) % T_CHUNK
if t_pad: tri16 = jnp.concatenate([tri16, jnp.zeros((t_pad,16), jnp.float32)],0)
body11 = jnp.zeros((16, D, B), jnp.float32)
body11 = body11.at[0].set(dpx).at[1].set(dpy).at[2].set(dpz).at[6].set(1.0).at[7].set(0.2).at[8].set(0.2).at[9].set(0.2).at[10].set(1.0)
ck = jax.jit(lambda b11: body_contacts_pallas(tri16, cmap.chunk_bounds, b11, D, cmap.aux["body_margin"]))
timeit("contact kernel alone", ck, body11)
print(f"solver share ~{(t_full-t_s1)*8/7*1e3:.3f} ms  pair share ~{(t_full-t_p0)*1e3:.3f} ms")
