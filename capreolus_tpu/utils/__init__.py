from capreolus_tpu.utils.loginit import get_logger
from capreolus_tpu.utils.caching import TargetFileExists, cached_file, done_file
from capreolus_tpu.utils.exceptions import CapreolusTPUError, MissingDocError

__all__ = [
    "CapreolusTPUError",
    "MissingDocError",
    "TargetFileExists",
    "cached_file",
    "done_file",
    "get_logger",
]
