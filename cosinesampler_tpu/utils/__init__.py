from .pointgen import PointGenerator
from .profiling import roofline, sampler_bytes, time_fn, trace

__all__ = ["PointGenerator", "roofline", "sampler_bytes", "time_fn", "trace"]
