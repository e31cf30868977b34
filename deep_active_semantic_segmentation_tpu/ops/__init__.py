"""Jitted numerical kernels: losses, metrics, schedules, scoring, geometry."""
