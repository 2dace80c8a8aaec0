"""Training runtime: loss/score, Adamax + per-tensor clip + warmup/decay
schedule, pjit'ed donated train/eval steps over a device mesh, text logging in
the reference's format, Orbax checkpoint/resume."""
