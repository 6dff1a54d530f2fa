"""`sela_tpu.ref` — pure-numpy oracle implementation of the sela_tpu profile.

This package is the executable form of FORMAT.md: scalar-clear, sequential,
and normative. Every accelerated implementation (sela_tpu.ops, sela_tpu.kernels,
sela_tpu.native) is validated against it bit-exactly.
"""
from . import codec, container, frame, lpc, rice, wav  # noqa: F401
from .codec import decode_sela, encode_wav  # noqa: F401
from .wav import WavData, read_wav, read_wav_bytes, write_wav, write_wav_bytes  # noqa: F401
