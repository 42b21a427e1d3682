from concrete_tpu.tracing.tracer import Tracer

__all__ = ["Tracer"]
