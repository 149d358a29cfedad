from c_game_engine_tpu.models.sim import BatchedSim, make_sim  # noqa: F401
