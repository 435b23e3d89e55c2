"""Terrain tier: per-cell Kalman elevation mapping + map-aware foothold
selection (the rebuild of elevation_mapping + the VisionMPC/CMPC_cv
foothold logic)."""
