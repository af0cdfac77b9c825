"""Diffusion math: noise schedules, DDIM sampling, training targets."""
