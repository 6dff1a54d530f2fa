"""Batched jnp ops: i64 emulation, float analysis, normative integer codec math."""
from . import analysis, coeffs, filters, i64, rice  # noqa: F401
