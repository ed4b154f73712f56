"""Hot-path compute ops: XLA reference implementations + Pallas TPU kernels."""
