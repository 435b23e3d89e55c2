"""Control layer: MPC locomotion driver, reference trajectory builder,
closed-loop stepping (the TPU rebuild of src/controllers/convexMPC/)."""
