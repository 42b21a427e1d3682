from concrete_tpu.optimizer.v0 import optimize_v0

__all__ = ["optimize_v0"]
