"""Core batched numerical ops: rotations, discretization, condensation,
QP solvers, gait timing, swing trajectories, disturbance estimation."""
