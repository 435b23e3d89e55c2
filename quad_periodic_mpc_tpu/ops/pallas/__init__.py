"""Pallas TPU kernels for the hot MPC ops."""
