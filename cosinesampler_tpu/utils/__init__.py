from .profiling import roofline, sampler_bytes, time_fn, trace

__all__ = ["roofline", "sampler_bytes", "time_fn", "trace"]
