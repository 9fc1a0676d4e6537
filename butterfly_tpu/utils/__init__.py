from butterfly_tpu.utils.errors import (
    ButterflyError,
    IncompatibleShapeError,
    InvalidArgumentsError,
    NotImplementedButterflyError,
    OutOfRangeError,
    RuntimeButterflyError,
    check,
)
from butterfly_tpu.utils.logging import (
    log_debug,
    log_error,
    log_info,
    log_metrics,
    log_todo,
    log_warn,
    set_log_level,
)
from butterfly_tpu.utils.prng import crandn, host_rng, next_key, randn, seed
from butterfly_tpu.utils.timer import Timer, device_time, toc

__all__ = [
    "ButterflyError",
    "IncompatibleShapeError",
    "InvalidArgumentsError",
    "NotImplementedButterflyError",
    "OutOfRangeError",
    "RuntimeButterflyError",
    "check",
    "log_debug",
    "log_error",
    "log_info",
    "log_metrics",
    "log_todo",
    "log_warn",
    "set_log_level",
    "crandn",
    "host_rng",
    "next_key",
    "randn",
    "seed",
    "Timer",
    "device_time",
    "toc",
]
