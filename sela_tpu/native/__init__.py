"""Native C++ host components (bitstream pack/unpack) with ctypes bindings."""
