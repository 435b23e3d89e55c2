"""State estimation tier: orientation + linear-KF position/velocity
(the rebuild of src/common/Controllers/{OrientationEstimator,
PositionVelocityEstimator}.cpp), batched."""
