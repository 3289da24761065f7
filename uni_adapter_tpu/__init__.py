"""uni_adapter_tpu — TPU-native rebuild of Uni-Adapter.

Training-free online test-time adaptation of 3D vision-language foundation
models (Uni3D, ULIP-2, OpenShape Point-BERT), re-designed for TPU:
JAX/XLA/Pallas compute, pure-functional adaptation state threaded through
lax.scan, pjit/Mesh data parallelism with psum-exact streaming statistics.
"""
__version__ = "0.1.0"
