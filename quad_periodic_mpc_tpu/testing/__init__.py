"""Test/parity support: golden reference solvers and fixture generation."""
