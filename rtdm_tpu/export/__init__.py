from rtdm_tpu.export.engine import Engine, EngineSpec, build_engine

__all__ = ["Engine", "EngineSpec", "build_engine"]
