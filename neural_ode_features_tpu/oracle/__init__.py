"""Torch-CPU oracle for parity checks and baseline throughput (lazy torch)."""
