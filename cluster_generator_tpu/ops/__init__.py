"""Low-level ops: Pallas kernels and native (C++) host utilities."""
