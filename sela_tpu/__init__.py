"""sela_tpu — TPU-native lossless audio codec framework.

A brand-new JAX/XLA/Pallas implementation of the SELA capability set
(sahaRatul/sela): per-frame mid/side decorrelation, Levinson-Durbin LPC with
companded reflection-coefficient quantization, integer-exact Q20 residual
prediction, and Rice entropy coding into a packed `.sela` container.

Layout:
  format/    frozen bitstream constants (FORMAT.md is the spec)
  ref/       numpy oracle — the executable spec
  ops/       batched jnp implementations (frames x channels dense arrays)
  kernels/   Pallas TPU kernels for the hot loops (IIR scan, rice pack)
  codec/     jit'd end-to-end encode/decode pipelines
  parallel/  mesh construction, data-parallel sharding, ordered gather
  native/    C++ host bitstream/container fast path (ctypes bindings)
  utils/     timing, bits, logging helpers
"""

__version__ = "0.1.0"
