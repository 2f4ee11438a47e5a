"""Pallas TPU kernels for the perf-critical composite ops (SURVEY §2.9):
fused attention (softmax+mask+dropout+PV in one VMEM-resident pass) in two
forms: whole-KV-resident query-blocked (fused_attention, Lk <= 8192) and
k-blocked streaming with online softmax (streaming_attention, Lk bounded
only by HBM).

No function re-exports here: the kernel entry points share their module
names, and re-exporting them would shadow the submodules on the package
(``import zero_tpu.ops.kernels.fused_attention as m`` would silently bind
the function). Import from the submodules directly.
"""

from zero_tpu.ops.kernels import fused_attention  # noqa: F401
from zero_tpu.ops.kernels import streaming_attention  # noqa: F401
