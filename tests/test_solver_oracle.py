"""Analytic acceptance oracle for the dynamic-body SAT solver.

The character controller is cross-validated against a double-precision
C++ oracle (tests/test_native.py); these tests give the round-2 body
solver (physics/batched.py::step_bodies_batched, the replacement for
JPH_PhysicsSystem_Update — /root/reference/engine/src/physics/
MapPhysics.c:105-108) an INDEPENDENT yardstick: closed-form rigid-body
mechanics, not the solver's own prior behavior.

Constants under test: bodies carry Jolt's default friction 0.2
(compiler/actor_rows.py:89), the map surface 4.25 (physics/batched.py
MAP_FRICTION), combined geometrically like Jolt's default FrictionCombine:
    mu = sqrt(0.2 * 4.25) = 0.922,  slide threshold atan(mu) = 42.66 deg
Restitution is 0 (Jolt body default; the reference never sets one), so
drops must land dead, and an off-center supported box must tip with the
torque's sign.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c_game_engine_tpu.core.actions import Actions
from c_game_engine_tpu.core.state import reset
from c_game_engine_tpu.core.step import step

from tests.worldgen import actor, make_map

MU = float(np.sqrt(0.2 * 4.25))
G = 9.81
HALF = 0.2  # physbox half extent
TPS = 60.0


def _quad(a, b, c, d):
    return [[a, b, c], [a, c, d]]


def _tess_quad(a, b, c, d, n):
    """Subdivide quad a-b-c-d into an n x n grid of small quads (editor
    maps emit ~unit-scale triangles; the solver's triangle-centroid
    stabilization pass assumes contact anchors near the body, so giant
    synthetic triangles are out-of-model)."""
    a, b, c, d = (np.asarray(p, np.float32) for p in (a, b, c, d))
    tris = []
    for i in range(n):
        for j in range(n):
            u0, u1 = i / n, (i + 1) / n
            v0, v1 = j / n, (j + 1) / n

            def pt(u, v):
                return a + (b - a) * v + (d - a) * u + (c - b - d + a) * u * v

            tris += _quad(pt(u0, v0), pt(u0, v1), pt(u1, v1), pt(u1, v0))
    return tris


def _ramp_map(theta_deg: float, cls="npc_john", drop=0.7, tess=0):
    """An infinite-feeling inclined plane, descending toward +x:
    y(x) = -tan(theta) * x. Same winding as worldgen.box_room's floor.

    The default test body is npc_john: a DYNAMIC cylinder with Jolt's
    Y-only rotation lock (NpcJohn.c JohnInit) — it cannot tip or tumble,
    so ramp motion isolates the translational Coulomb friction branch.
    (A free prop_physbox is the wrong oracle vehicle here: with
    mu = 0.92 a cube's slide threshold ~42.7 deg exceeds its 45-deg
    static TIPPING threshold, and landing on a slope edge starts a
    physically-plausible tumble.)

    The ramp is a SINGLE quad: per-triangle SAT contacts can catch on a
    tessellation's interior edges once a body moves slowly (Jolt masks
    these with active-edge detection; PARITY.md), which would jam the
    slide branch. The rot-locked cylinder doesn't need near contact
    anchors, so the untessellated plane is the clean oracle geometry.
    Measured on this rig: slide acceleration within 6% of the Coulomb
    prediction at 55-80 deg (benchmarks history: 2.68/2.85 at 55,
    8.094/8.090 at 80)."""
    t = float(np.tan(np.radians(theta_deg)))
    h = 12.0
    corners = ((-h, h * t, -h), (-h, h * t, h), (h, -h * t, h), (h, -h * t, -h))
    if tess:
        tris = np.array(_tess_quad(*corners, tess), np.float32)
    else:
        tris = np.array(_quad(*corners), np.float32)
    body = actor(cls, (0.0, drop, 0.0))
    # player far off to the side so the capsule never touches the body
    return make_map([body], tris=tris, spawn=(0.0, 8.0 * t + 1.0, -8.0))


def _run(cmap, ticks, state=None):
    sfn = jax.jit(lambda s, a: step(cmap, s, a))
    st = reset(cmap) if state is None else state
    a = Actions.zeros()
    traj = []
    for _ in range(ticks):
        st = sfn(st, a)
        traj.append((np.asarray(st.actors.pos), np.asarray(st.actors.vel),
                     np.asarray(st.actors.omega)))
    return st, traj


def _row_of(cmap, cls):
    return next(i for i, c in enumerate(cmap.aux["actor_classes"]) if c == cls)


def _box_row(cmap):
    return _row_of(cmap, "PHYSBOX")


def test_friction_cone_holds_below_threshold():
    """tan(30 deg) = 0.577 << mu = 0.922: static friction must pin the
    rot-locked cylinder (Coulomb cone; Jolt holds bodies strictly inside
    the cone static)."""
    cmap = _ramp_map(30.0)
    i = _row_of(cmap, "NPC_JOHN")
    st, _ = _run(cmap, 120)  # settle onto the ramp
    p0 = np.asarray(st.actors.pos[i]).copy()
    st, _ = _run(cmap, 120, state=st)
    p1 = np.asarray(st.actors.pos[i])
    assert np.linalg.norm(p1 - p0) < 0.05, (p0, p1)
    assert float(jnp.linalg.norm(st.actors.vel[i])) < 0.05


def test_friction_cone_slides_above_threshold():
    """tan(55 deg) = 1.43 > mu = 0.922: the rot-locked cylinder must
    slide, with acceleration along the slope a = g (sin t - mu cos t) =
    2.85 m/s^2 analytically (it cannot tip: x/z rotation is locked).
    Angles within ~5 deg of the 42.7 deg threshold sit in the solver's
    stick-slip discretization margin and under-slide; 55 deg is cleanly
    inside the sliding regime."""
    theta = 55.0
    cmap = _ramp_map(theta)
    i = _row_of(cmap, "NPC_JOHN")
    st, _ = _run(cmap, 60)  # land + enter steady sliding
    v1 = np.asarray(st.actors.vel[i]).copy()
    window = 30
    st, _ = _run(cmap, window, state=st)
    v2 = np.asarray(st.actors.vel[i])
    tr = np.radians(theta)
    a_pred = G * (np.sin(tr) - MU * np.cos(tr))
    # measured acceleration magnitude along the slope over the window
    a_meas = np.linalg.norm(v2 - v1) * TPS / window
    assert a_meas > 0.5 * a_pred, (a_meas, a_pred)
    assert a_meas < 1.5 * a_pred, (a_meas, a_pred)
    # direction: downhill (+x, -y), no sideways drift
    d = (v2 - v1) / np.linalg.norm(v2 - v1)
    assert d[0] > 0.5 and d[1] < 0.0 and abs(d[2]) < 0.2, d


def test_kinetic_friction_stops_slider():
    """Flat floor: a rot-locked cylinder kicked to 3 m/s must decelerate
    at ~mu*g = 9.05 m/s^2 (Coulomb kinetic friction; it cannot convert to
    rolling) and come to rest in ~0.33 s."""
    cmap = make_map(
        [actor("npc_john", (4.0, -0.45, 4.0))], spawn=(0.0, 0.0, -4.0)
    )
    i = _row_of(cmap, "NPC_JOHN")
    st, _ = _run(cmap, 120)  # settle
    assert float(jnp.linalg.norm(st.actors.vel[i])) < 0.05
    st = st.replace(
        actors=st.actors.replace(
            vel=st.actors.vel.at[i].set(jnp.array([3.0, 0.0, 0.0])),
            sleep=st.actors.sleep.at[i].set(0),
        )
    )
    window = 10
    st, _ = _run(cmap, window, state=st)
    v1 = np.asarray(st.actors.vel[i])
    a_meas = (3.0 - v1[0]) * TPS / window
    a_pred = MU * G
    assert 0.5 * a_pred < a_meas < 1.5 * a_pred, (a_meas, a_pred)
    st, _ = _run(cmap, 30, state=st)
    assert float(jnp.linalg.norm(st.actors.vel[i])) < 0.15


def test_drop_lands_dead_restitution_zero():
    """Restitution 0: a 1 m drop onto the floor must not rebound — the
    peak height after first contact stays within the contact slop."""
    cmap = make_map(
        [actor("prop_physbox", (4.0, 0.0, 4.0))], spawn=(0.0, 0.0, -4.0)
    )
    i = _box_row(cmap)
    _, traj = _run(cmap, 180)
    ys = np.array([p[i, 1] for p, _, _ in traj])
    rest = -1.0 + HALF
    touched = np.nonzero(ys < rest + 0.02)[0]
    assert len(touched), ys.min()
    after = ys[touched[0]:]
    # an elastic bounce of even 10% of the drop would rise ~0.1 above rest
    assert after.max() < rest + 0.05, after.max()
    assert abs(ys[-1] - rest) < 0.05, ys[-1]


def test_offcenter_support_tips_with_torque_sign():
    """A box whose center of mass overhangs a ledge edge must tip: gravity
    about the edge line (along z) gives tau_z = -x_com * m g < 0, so
    omega_z goes negative and the box rotates as it falls."""
    h = 12.0
    tris = np.array(
        # upper platform y = 0 for x <= 0
        _tess_quad((-h, 0.0, -h), (-h, 0.0, h), (0.0, 0.0, h), (0.0, 0.0, -h), 16)
        # lower floor y = -2 for x >= 0
        + _tess_quad((0.0, -2.0, -h), (0.0, -2.0, h), (h, -2.0, h), (h, -2.0, -h), 16)
        # the vertical ledge face at x = 0 (faces +x)
        + _tess_quad((0.0, -2.0, -h), (0.0, -2.0, h), (0.0, 0.0, h), (0.0, 0.0, -h), 8),
        np.float32,
    )
    # CoM at x = +0.1: edge support at x = 0, overhang -> tip toward +x
    cmap = make_map(
        [actor("prop_physbox", (0.1, 0.25, 0.0))], tris=tris,
        spawn=(-6.0, 1.0, -6.0),
    )
    i = _box_row(cmap)
    st, traj = _run(cmap, 150)
    wz = np.array([o[i, 2] for _, _, o in traj])
    assert wz.min() < -0.5, wz.min()  # developed a real tipping spin...
    assert wz.min() < -abs(wz.max()), (wz.min(), wz.max())  # ...with the torque's sign
    # and ended up off the ledge, at/below the lower-floor rest band
    p = np.asarray(st.actors.pos[i])
    assert p[1] < -1.0, p
    assert p[0] > 0.05, p


def test_friction_slide_on_tessellated_ramp():
    """The 55-deg Coulomb slide oracle on a 24x24-TESSELLATED ramp (1152
    triangles, ~1 m cells): the slider must cross the interior
    tessellation edges without jamming and accelerate within the same
    bound as on the single-quad ramp. Before the active-edge fix
    (compiler/edges.py + the inactive-edge normal replacement in both
    contact paths) the slider jammed here — the docstring of _ramp_map
    recorded it as PARITY #17. Jolt masks these edges in its MeshShape
    cooking (MapLoader.c:200-273)."""
    theta = 55.0
    cmap = _ramp_map(theta, tess=24)
    i = _row_of(cmap, "NPC_JOHN")
    st, _ = _run(cmap, 60)  # land + enter steady sliding
    v1 = np.asarray(st.actors.vel[i]).copy()
    window = 30
    st, _ = _run(cmap, window, state=st)
    v2 = np.asarray(st.actors.vel[i])
    tr = np.radians(theta)
    a_pred = G * (np.sin(tr) - MU * np.cos(tr))
    a_meas = np.linalg.norm(v2 - v1) * TPS / window
    assert a_meas > 0.5 * a_pred, (a_meas, a_pred)
    assert a_meas < 1.5 * a_pred, (a_meas, a_pred)
    d = (v2 - v1) / np.linalg.norm(v2 - v1)
    assert d[0] > 0.5 and d[1] < 0.0 and abs(d[2]) < 0.2, d


def test_kinetic_friction_on_tessellated_floor():
    """Flat-floor kinetic slide across a 12x12-tessellated floor: the
    deceleration must stay ~mu*g — interior seams must neither jam the
    slider (a_meas >> pred) nor trip it."""
    f, hh = -1.0, 8.0
    tris = np.array(
        _tess_quad((-hh, f, -hh), (-hh, f, hh), (hh, f, hh), (hh, f, -hh), 12),
        np.float32,
    )
    cmap = make_map(
        [actor("npc_john", (-4.0, -0.45, 0.0))], tris=tris, spawn=(0.0, 0.0, -7.0)
    )
    i = _row_of(cmap, "NPC_JOHN")
    st, _ = _run(cmap, 120)
    assert float(jnp.linalg.norm(st.actors.vel[i])) < 0.05
    st = st.replace(
        actors=st.actors.replace(
            vel=st.actors.vel.at[i].set(jnp.array([3.0, 0.0, 0.0])),
            sleep=st.actors.sleep.at[i].set(0),
        )
    )
    window = 10
    st, _ = _run(cmap, window, state=st)
    v1 = np.asarray(st.actors.vel[i])
    a_meas = (3.0 - v1[0]) * TPS / window
    a_pred = MU * G
    assert 0.5 * a_pred < a_meas < 1.5 * a_pred, (a_meas, a_pred)
