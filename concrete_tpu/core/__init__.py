"""Crypto core: numpy oracle (refimpl) and JAX/XLA kernels (kernels)."""
