"""Analytic simulation backends for closed-loop tests and Monte-Carlo
sweeps (the rebuild's stand-in for raisim_unitree_ros_driver)."""
