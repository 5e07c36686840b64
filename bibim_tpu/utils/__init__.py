"""Foundation utilities (reference src/util.*, src/enum_array.h, src/resource.cpp)."""

from bibim_tpu.utils.log import bb_assert, log_error, log_info, log_warning
from bibim_tpu.utils.timing import Stopwatch, get_current_time
from bibim_tpu.utils.config import ResourceRoot, init_resource_root
from bibim_tpu.utils.enums import EnumArray, all_enums

__all__ = [
    "bb_assert",
    "log_info",
    "log_warning",
    "log_error",
    "Stopwatch",
    "get_current_time",
    "ResourceRoot",
    "init_resource_root",
    "EnumArray",
    "all_enums",
]
