"""Device-side compute kernels (JAX/XLA/Pallas)."""
