"""Performance tracking: wall-clock, throughput, device memory, profiler.

TPU-native equivalent of the reference's ``--track_metrics`` machinery
(``runners/diffpose_frame.py:52-57, 346-379, 422-461``): wall-clock
bracketing with ``block_until_ready`` instead of ``cuda.synchronize``,
device memory via ``jax.Device.memory_stats()`` instead of
``max_memory_allocated``, and ``jax.profiler`` traces for kernel-level
inspection (the XLA equivalent of nvprof-style tracing).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


class MetricsTracker:
    def __init__(self):
        self.inference_times: List[float] = []
        self.memory_bytes: List[int] = []
        self.diffusion_step_count: int = 0
        self.fp_iteration_counts: List[int] = []
        self._t0: Optional[float] = None

    # -- timing --------------------------------------------------------

    @contextlib.contextmanager
    def time_block(self, result_to_block=None):
        t0 = time.perf_counter()
        yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        self.inference_times.append(time.perf_counter() - t0)

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result_to_block=None):
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        assert self._t0 is not None
        self.inference_times.append(time.perf_counter() - self._t0)
        self._t0 = None

    # -- memory --------------------------------------------------------

    def record_memory(self, device: Optional[jax.Device] = None):
        device = device or jax.devices()[0]
        stats = device.memory_stats() or {}
        used = stats.get("bytes_in_use") or stats.get("peak_bytes_in_use") or 0
        self.memory_bytes.append(int(used))

    # -- summary -------------------------------------------------------

    def summary(self, frames_per_call: Optional[int] = None) -> Dict[str, float]:
        out: Dict[str, float] = {}
        if self.inference_times:
            total = sum(self.inference_times)
            out.update(
                time_avg=total / len(self.inference_times),
                time_min=min(self.inference_times),
                time_max=max(self.inference_times),
                time_total=total,
            )
            if frames_per_call:
                out["frames_per_second"] = frames_per_call * len(self.inference_times) / total
        if self.memory_bytes:
            out["memory_mb_peak"] = max(self.memory_bytes) / (1024 * 1024)
        if self.diffusion_step_count:
            out["diffusion_steps"] = self.diffusion_step_count
        if self.fp_iteration_counts:
            out["fp_iterations_mean"] = sum(self.fp_iteration_counts) / len(self.fp_iteration_counts)
        return out

    def write(self, path: str, frames_per_call: Optional[int] = None):
        """performance_metrics.txt-style dump (runners/diffpose_frame.py:452-461)."""
        s = self.summary(frames_per_call)
        with open(path, "w") as f:
            f.write("=== Performance Metrics ===\n")
            for k, v in s.items():
                f.write(f"{k}: {v:.4f}\n")
            f.write("\n=== Raw Data ===\n")
            f.write(f"Times: {self.inference_times}\n")
            f.write(f"Memory: {self.memory_bytes}\n")


@contextlib.contextmanager
def trace_profile(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
