from c_game_engine_tpu.assets.container import AssetType, read_asset, write_asset  # noqa: F401
