"""c_game_engine_tpu — TPU-native batched FPS simulation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
NBT22/c-game-engine (an SDL3 + Vulkan + Jolt FPS engine): thousands of
environment instances stepping in lockstep per chip instead of one
interactive window. See ARCHITECTURE.md and SURVEY.md.
"""

__version__ = "0.1.0"

TARGET_TPS = 60  # reference: engine/include/engine/Engine.h:12, physics/Physics.h:12
MIN_TPS = 10  # reference: engine/include/engine/physics/Physics.h:14
GRAVITY = -9.81  # reference: engine/include/engine/physics/Physics.h:34
COLLISION_SUBSTEPS = 2  # reference: engine/src/physics/MapPhysics.c:107
MAX_CONTACT_CONSTRAINTS = 16384  # reference: engine/include/engine/physics/Physics.h:16

# Persistent XLA compilation cache: first-compile on the tunneled TPU stack
# costs minutes; cache compiled executables across processes.
import os as _os

if not _os.environ.get("CGE_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir", _os.path.expanduser("~/.cache/cge_jax"))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
