"""Map compiler structure tests over the shipped maps."""

import glob

import numpy as np
import pytest

from c_game_engine_tpu.actors.defs import ActorClass, Motion
from c_game_engine_tpu.compiler.compile import compile_map

MAPS = "/root/reference/assets/game/map"


@pytest.mark.parametrize(
    "name", [p.split("/")[-1][:-5] for p in sorted(glob.glob(f"{MAPS}/*.gmap"))]
)
def test_compile_all_shipped_maps(name):
    cm = compile_map(f"{MAPS}/{name}.gmap")
    n = cm.aux["num_real_actors"]
    assert cm.num_actors >= n
    assert bool(np.asarray(cm.init_active)[:n].all())
    assert cm.tris.shape[0] >= cm.aux["num_real_tris"]


def test_test_map_structure(test_map):
    cm = test_map
    classes = cm.aux["actor_classes"]
    # 4 emitters each pre-spawn a laser child (LaserEmitter.c behavior)
    assert classes.count("LASER_EMITTER") == 4
    assert classes.count("LASER") == 4
    assert classes.count("PHYSBOX") == 1
    # trigger wiring from test.json compiled to integer edges
    assert cm.aux["num_real_edges"] > 0
    # physbox cube: exact box half extents
    i = classes.index("PHYSBOX")
    assert np.allclose(np.asarray(cm.halfext[i]), [0.2, 0.2, 0.2], atol=1e-5)
    assert int(cm.motion[i]) == int(Motion.DYNAMIC)
    assert float(cm.mass[i]) == 10.0  # Physbox.c mass override


def test_door_compile():
    cm = compile_map(f"{MAPS}/advanced_doors.gmap")
    classes = cm.aux["actor_classes"]
    assert classes.count("DOOR") == 4
    i = classes.index("DOOR")
    width = float(cm.sfparams[i, 0])
    closed = np.asarray(cm.init_pos[i])
    opened = np.asarray(cm.sfparams[i, 2:5])
    # open and closed positions are `width` apart (Door.c:CreateDoorBodies)
    assert np.isclose(np.linalg.norm(opened - closed), width, atol=1e-4)
