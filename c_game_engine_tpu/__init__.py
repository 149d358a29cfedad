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
