from supir_tpu.engine.supir import SUPIREngine
