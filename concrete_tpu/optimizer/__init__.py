from concrete_tpu.optimizer.v0 import optimize_v0, optimize_v0_multi

__all__ = ["optimize_v0", "optimize_v0_multi"]
