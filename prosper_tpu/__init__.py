"""prosper_tpu — a TPU-native physically-based rendering engine in JAX/XLA/Pallas.

A from-scratch rebuild of the capabilities of sndels/prosper (C++/Vulkan):
wavefront path tracing, deferred + clustered shading, ReSTIR DI, meshlet
culling, TAA/DoF/bloom post chain, glTF scene streaming — re-designed for
TPU hardware (MXU/VPU tiles, HBM-resident flat scene arrays, functional
frame state, jit-compiled frame graphs).
"""

__version__ = "0.1.0"
