"""TPU compute kernels (Pallas / XLA) for block decode/encode."""
