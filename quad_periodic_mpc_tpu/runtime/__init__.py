"""Native host runtime bindings (C++ periodic loop, shared-memory ring,
UDP robot bridge, safety filter) — the rebuild of the reference's
LoopFunc / SharedMemory / unitree UDP tier."""
