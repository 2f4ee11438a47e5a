"""Pallas TPU kernels for the perf-critical composite ops (SURVEY §2.9):
fused attention (softmax+mask+dropout+PV in one VMEM-resident pass)."""

from zero_tpu.ops.kernels.fused_attention import fused_attention  # noqa: F401
