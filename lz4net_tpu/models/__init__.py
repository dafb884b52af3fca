"""Codec engines ("model families"): python-reference, native C++ oracle,
and the TPU (Pallas/XLA) engines, all behind one service protocol."""
