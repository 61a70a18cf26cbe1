"""Compute ops: host (numpy) helpers and device (JAX/Pallas) kernels."""
