"""hydracore3_tpu: TPU-native differentiable spectral path tracer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
Ray-Tracing-Systems/HydraCore3 (see SURVEY.md for the reference analysis).
"""
__version__ = '0.1.0'
