"""Pallas TPU kernels for the codec hot loops."""
from .iir import iir_synthesize_pallas  # noqa: F401
