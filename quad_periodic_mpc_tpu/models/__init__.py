"""Robot model constants and dynamics (SRB linearization, full floating-base
model for the WBC tier)."""
