"""Compute kernels: integrator, broadphase, narrowphase, contact solver."""
