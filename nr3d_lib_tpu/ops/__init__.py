"""L1: pure-function compute kernels (XLA reference impls + Pallas hot paths)."""
