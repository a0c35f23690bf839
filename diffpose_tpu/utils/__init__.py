from diffpose_tpu.utils.tsv_logger import Logger, LoggerMonitor, savefig
from diffpose_tpu.utils.profiling import MetricsTracker, trace_profile

__all__ = ["Logger", "LoggerMonitor", "savefig", "MetricsTracker", "trace_profile"]
