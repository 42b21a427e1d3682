"""Pallas TPU kernels for the hot paths of the PBS pipeline."""
