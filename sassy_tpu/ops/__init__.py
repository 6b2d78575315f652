"""Device compute kernels (JAX/XLA/Pallas)."""
