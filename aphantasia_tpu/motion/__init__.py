"""Motion & 3D subsystem: keyframe animation curves, per-frame transforms,
depth-driven grid warps (reference video modes, SURVEY.md §2.4)."""
