"""Synthetic map construction for targeted tests: builds GMap IR objects in
memory (no files), mirroring what the reference's level editor would emit."""

from __future__ import annotations

import numpy as np

from c_game_engine_tpu.assets.gmap import GMap, MapActor, MapCollisionMesh, MapConnection
from c_game_engine_tpu.assets.kvlist import Param, ParamType
from c_game_engine_tpu.compiler.compile import compile_map


def box_room(half: float = 8.0, floor_y: float = -1.0, ceil_y: float = 3.0) -> np.ndarray:
    """Triangle soup for a closed box room: floor, ceiling, 4 walls.
    Returns [T, 3, 3]."""
    h = half
    f, c = floor_y, ceil_y

    def quad(a, b, cn, d):
        return [[a, b, cn], [a, cn, d]]

    tris = []
    # floor (y=f), normal up
    tris += quad((-h, f, -h), (-h, f, h), (h, f, h), (h, f, -h))
    # ceiling (y=c)
    tris += quad((-h, c, -h), (h, c, -h), (h, c, h), (-h, c, h))
    # walls
    tris += quad((-h, f, -h), (h, f, -h), (h, c, -h), (-h, c, -h))  # z=-h
    tris += quad((h, f, h), (-h, f, h), (-h, c, h), (h, c, h))  # z=+h
    tris += quad((-h, f, h), (-h, f, -h), (-h, c, -h), (-h, c, h))  # x=-h
    tris += quad((h, f, -h), (h, f, h), (h, c, h), (h, c, -h))  # x=+h
    return np.array(tris, dtype=np.float32)


def P_bool(v):
    return Param(ParamType.BOOL, bool(v))


def P_int(v):
    return Param(ParamType.INTEGER, int(v))


def P_float(v):
    return Param(ParamType.FLOAT, float(v))


def P_byte(v):
    return Param(ParamType.BYTE, int(v))


def P_str(v):
    return Param(ParamType.STRING, str(v))


def P_vec2(x, y):
    return Param(ParamType.VEC2, (float(x), float(y)))


def P_color(r, g, b, a=1.0):
    return Param(ParamType.COLOR, (float(r), float(g), float(b), float(a)))


def actor(cls, pos=(0, 0, 0), rot=(0, 0, 0), params=None, connections=()):
    conns = [
        MapConnection(o, tn, ti, po if po is not None else Param.none(), 0)
        for (o, tn, ti, po) in connections
    ]
    return MapActor(
        cls,
        np.asarray(pos, np.float32),
        np.asarray(rot, np.float32),
        conns,
        params or {},
    )


def make_map(actors, tris=None, spawn=(0.0, 0.0, 0.0), spawn_yaw=0.0):
    if tris is None:
        tris = box_room()
    gmap = GMap(
        render_sky=False,
        sky_texture=None,
        discord_icon="",
        discord_name="synthetic",
        actors=list(actors),
        models=[],
        collision=[MapCollisionMesh(np.zeros(3, np.float32), [tris])],
        lightmap=np.ones((1, 1, 4), np.float32),
        point_lights=np.zeros((0, 9), np.float32),
        player_spawn=actor("player", spawn, (0, spawn_yaw, 0)),
    )
    return compile_map(gmap, name="synthetic")


def build_rig():
    """Kitchen-sink synthetic map: physbox, coin, trigger->door chain,
    counter, logic, button->light, laser emitter."""
    actors = [
        actor("prop_physbox", (4, 0, 0)),
        actor("prop_coin", (0, -0.5, -2), params={"isBlue": P_bool(False)}),
        actor(
            "trigger",
            (0, -0.5, 2),
            params={
                "width": P_float(2),
                "height": P_float(2),
                "depth": P_float(2),
                "oneShot": P_bool(False),
                "name": P_str("trig1"),
            },
            connections=[("entered", "door1", "open", None), ("exited", "door1", "close", None)],
        ),
        actor(
            "prop_door",
            (6, 0, 4),
            params={
                "name": P_str("door1"),
                "size": P_vec2(1.5, 2.0),
                "preventPlayerOpen": P_bool(True),
            },
        ),
        actor(
            "logic_counter",
            (0, 0, 0),
            params={
                "name": P_str("count1"),
                "min": P_int(0),
                "max": P_int(3),
                "counter": P_int(0),
            },
            connections=[("hit_max", "light1", "set_instant", None)],
        ),
        actor(
            "global_light",
            (0, 0, 0),
            params={
                "name": P_str("light1"),
                "light_color": P_color(1.0, 0.0, 0.0),
                "interpolation_ticks": P_int(0),
                "start_on": P_bool(False),
            },
        ),
        actor(
            "prop_button",
            (0, -0.5, -6),
            params={"name": P_str("btn1"), "toggle_mode": P_bool(False)},
            connections=[("pressed", "count1", "add", Param(ParamType.INTEGER, 3))],
        ),
        actor(
            "prop_laser_emitter",
            (-6, -0.3, 0),
            (0, np.pi / 2, 0),
            params={"height": P_byte(1), "startOn": P_bool(True), "name": P_str("em1")},
        ),
    ]
    return make_map(actors)
