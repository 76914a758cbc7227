from .logger import setup_logger, TrainMeter
from .profiling import trace, timeit_sync, summarize_trace
